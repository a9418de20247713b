"""Bit-parity of the fused Adam path with optax (the optimizer numerics the
whole identifier/regeneration contract rests on), plus checkpoint-structure
compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pgmvae_tpu.ops.fused_adam import fused_adam


def _tree(key, shapes):
    ks = jax.random.split(key, 2 * len(shapes))
    params = {f'p{i}': jax.random.normal(ks[2 * i], s) * 0.1
              for i, s in enumerate(shapes)}
    grads = {f'p{i}': jax.random.normal(ks[2 * i + 1], s) * 0.01
             for i, s in enumerate(shapes)}
    return params, grads


SHAPES = [(7, 9, 5), (7, 5, 5), (3, 4), (11,)]


@pytest.mark.parametrize('impl', ['xla', 'pallas'])
def test_bit_parity_with_optax(impl):
    # 'xla' (the production default) is BIT-equal to optax. 'pallas' runs
    # through Mosaic codegen where FMA contraction and divide/sqrt lowering
    # may legally differ from the XLA fusion by a few ULP — its contract is
    # ~1e-5 relative, and it is a bench/fallback path, never the
    # identifier-bearing default.
    lr, eps = 3e-3, 1e-7
    ref = optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=eps)
    fa = fused_adam(lr, eps=eps, impl=impl, interpret=(impl == 'pallas'))

    params, _ = _tree(jax.random.PRNGKey(0), SHAPES)
    s_ref = ref.init(params)
    s_fa = fa.init(params)
    assert (jax.tree_util.tree_structure(s_ref)
            == jax.tree_util.tree_structure(s_fa))

    def check(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        if impl == 'xla':
            np.testing.assert_array_equal(a, b, err_msg=msg)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-9,
                                       err_msg=msg)

    p_ref, p_fa = params, params
    for t in range(4):
        _, grads = _tree(jax.random.PRNGKey(100 + t), SHAPES)
        u, s_ref = ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        p_fa, s_fa = fa.apply(grads, s_fa, p_fa)
        for k in p_ref:
            check(p_ref[k], p_fa[k], f'step {t} {k}')
    # moments match too (checkpoint interchange)
    mu_r = s_ref.inner_state[0].mu
    mu_f = s_fa.inner_state[0].mu
    for k in mu_r:
        check(mu_r[k], mu_f[k], k)
    assert int(s_ref.inner_state[0].count) == int(s_fa.inner_state[0].count)


def test_state_roundtrips_through_serialization():
    from flax import serialization
    lr = 1e-3
    fa = fused_adam(lr)
    params, grads = _tree(jax.random.PRNGKey(1), SHAPES)
    s = fa.init(params)
    _, s = fused_adam(lr).apply(grads, s, params)[1], \
        fa.apply(grads, s, params)[1]
    d = serialization.to_state_dict(s)
    s2 = serialization.from_state_dict(fa.init(params), d)
    assert (jax.tree_util.tree_structure(s)
            == jax.tree_util.tree_structure(s2))


def test_trainer_end_to_end_equivalence(monkeypatch):
    """The fused path through real training epochs (EMA quantizer, ragged
    batches, dead-code restarts) tracks the optax path to XLA-fusion noise.
    It is NOT bit-identical inside jit (different fusion shapes contract
    FMAs differently — why 'optax' stays the identifier-bearing default and
    'fused' is recorded as ad-fused); the drift must stay in the few-ULP
    band, not a dynamics change."""
    import jax.numpy as jnp

    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.train import Trainer

    cfg = VqVaeConfig(n_var=6, units=(5, 4), dim=3, num_codes=7, cost=0.25,
                      decay=0.9, quantizer='ema', dead_code_threshold=0.5)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 2, size=(37, 6)).astype(np.float32))

    finals = {}
    for impl in ('optax', 'fused'):
        monkeypatch.setenv('PGMVAE_ADAM_IMPL', impl)
        tr = Trainer(cfg, 0.01, 8, 37)
        assert tr.adam_impl == impl
        state = tr.init_state(jax.random.PRNGKey(0))
        state, _ = tr.fit(state, y, epochs=5, key=jax.random.PRNGKey(1))
        finals[impl] = jax.tree.map(np.asarray, state)

    a, b = finals['optax'], finals['fused']
    for (pa, va), (_, vb) in zip(
            jax.tree_util.tree_flatten_with_path(a.params)[0],
            jax.tree_util.tree_flatten_with_path(b.params)[0]):
        np.testing.assert_allclose(va, vb, rtol=1e-5, atol=1e-7,
                                   err_msg=str(pa))
    np.testing.assert_allclose(a.ema.codebook, b.ema.codebook,
                               rtol=1e-5, atol=1e-7)


def test_adam_impl_identifier_roundtrip():
    """ad-fused is part of the cell identity and round-trips."""
    from pgmvae_tpu.driver import ExperimentConfig
    from pgmvae_tpu.utils.logging import parse_identifier

    c = ExperimentConfig(name='bbc', embedding=50, dim=20, batch=250,
                         epoch=600, rate=0.01, cost=0.05, ema=True,
                         decay=0.9, seed=1, dead_code_threshold=0.25,
                         fan_mode='per_network', select_on_valid=50,
                         packed_seeds=3, adam_impl='fused')
    ident = c.identifier
    assert ident.endswith('_pk-3_ad-fused')
    kw = parse_identifier(ident)
    assert kw['adam_impl'] == 'fused'
    assert ExperimentConfig(**kw).identifier == ident
    # default impl leaves the identifier untouched (reference-compatible)
    c0 = c.__class__(**{**kw, 'adam_impl': 'optax'})
    assert '_ad-' not in c0.identifier


def test_fused_bf16_moments_trains_and_tracks(monkeypatch):
    """fused_bf16 stores bf16 moments (half the optimizer-state traffic)
    and must track the f32 dynamics loosely — a dynamics sanity check, not
    a parity pin."""
    import jax.numpy as jnp

    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.train import Trainer

    cfg = VqVaeConfig(n_var=6, units=(5, 4), dim=3, num_codes=7, cost=0.25,
                      decay=0.9, quantizer='ema')
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 2, size=(64, 6)).astype(np.float32))

    losses = {}
    for impl in ('optax', 'fused_bf16'):
        monkeypatch.setenv('PGMVAE_ADAM_IMPL', impl)
        tr = Trainer(cfg, 0.01, 16, 64)
        state = tr.init_state(jax.random.PRNGKey(0))
        if impl == 'fused_bf16':
            mu = state.opt_state.inner_state[0].mu
            assert all(l.dtype == jnp.bfloat16
                       for l in jax.tree_util.tree_leaves(mu))
        state, ms = tr.fit(state, y, epochs=8, key=jax.random.PRNGKey(1))
        losses[impl] = float(ms[-1].loss)
    # same ballpark final loss (bf16 moment rounding is ~0.4% relative)
    assert abs(losses['fused_bf16'] - losses['optax']) < 0.05 * abs(
        losses['optax']) + 1e-3, losses
