"""Model-level tests: the batched model must be exactly n_var independent
MLPs (the reference's core capability, reference core/dense.py:15-111), plus
init-scale and variable-subset (fts) behavior.

The oracle reflects the padded masked leave-one-out design: network v sees
the full sample with its own variable's input zeroed — identical math to the
reference's gathered [.., n_var-1] views (zero input contributes nothing)."""

import numpy as np
import jax
import jax.numpy as jnp

from pgmvae_tpu.models import vqvae

CFG = vqvae.VqVaeConfig(n_var=6, units=(7, 5), dim=4, num_codes=9,
                        cost=0.25, decay=0.99, quantizer='ema')


def _np_selu(x):
    alpha, scale = 1.6732632423543772, 1.0507009873554805
    return scale * np.where(x > 0, x, alpha * (np.exp(x) - 1))


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_single_forward(params, codebook, y, v):
    """Independent per-variable MLP in NumPy: full-width input with column v
    zeroed, variable v's weight slices."""
    h = y.copy()
    h[:, v] = 0.0
    for w, b in params['enc']:
        h = _np_selu(h @ np.asarray(w)[v] + np.asarray(b)[v, 0])
    z = h
    d = np.sum((z[:, :, None] - np.asarray(codebook)[v][None]) ** 2, axis=1)
    idx = np.argmin(d, axis=1)
    latent = np.asarray(codebook)[v][:, idx].T
    for w, b in params['dec'][:-1]:
        latent = _np_selu(latent @ np.asarray(w)[v] + np.asarray(b)[v, 0])
    w, b = params['dec'][-1]
    return _np_sigmoid(latent @ np.asarray(w)[v] + np.asarray(b)[v, 0]), idx


def test_batched_model_equals_independent_mlps():
    key = jax.random.PRNGKey(42)
    params, codebook = vqvae.init_model(key, CFG)
    y = jax.random.uniform(jax.random.PRNGKey(1), (11, CFG.n_var))
    out = vqvae.apply_model(params, codebook, y, CFG)
    yn = np.asarray(y)
    for v in range(CFG.n_var):
        recon_v, idx_v = _np_single_forward(params, codebook, yn, v)
        np.testing.assert_allclose(np.asarray(out.recon)[v], recon_v,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.indices)[v], idx_v)


def test_own_variable_is_inert():
    """Flipping variable v in the input must not change network v's output
    (the padded mask) — the defining property of leave-one-out."""
    params, codebook = vqvae.init_model(jax.random.PRNGKey(3), CFG)
    y = (jax.random.uniform(jax.random.PRNGKey(4), (5, CFG.n_var))
         < 0.5).astype(jnp.float32)
    out_a = vqvae.apply_model(params, codebook, y, CFG)
    for v in range(CFG.n_var):
        y_flip = y.at[:, v].set(1.0 - y[:, v])
        out_b = vqvae.apply_model(params, codebook, y_flip, CFG)
        np.testing.assert_allclose(np.asarray(out_b.recon)[v],
                                   np.asarray(out_a.recon)[v],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out_b.indices)[v],
                                      np.asarray(out_a.indices)[v])


def test_inert_weights_get_zero_gradient():
    """The diagonal row of enc0 and diagonal column of dec_last carry no
    gradient (masked input / masked loss)."""
    params, codebook = vqvae.init_model(jax.random.PRNGKey(5), CFG)
    y = (jax.random.uniform(jax.random.PRNGKey(6), (8, CFG.n_var))
         < 0.5).astype(jnp.float32)
    mask = vqvae.loo_mask(CFG.n_var, None, jnp.float32)

    def loss(params):
        out = vqvae.apply_model(params, codebook, y, CFG)
        mse = jnp.sum(((out.recon - y[None]) ** 2) * mask)
        return mse + CFG.cost * out.e_loss

    g = jax.grad(loss)(params)
    g_enc0 = np.asarray(g['enc'][0][0])           # [n, n, u0]
    g_dec9 = np.asarray(g['dec'][-1][0])          # [n, u_last, n]
    for v in range(CFG.n_var):
        np.testing.assert_allclose(g_enc0[v, v, :], 0.0, atol=1e-8)
        np.testing.assert_allclose(g_dec9[v, :, v], 0.0, atol=1e-8)
    # off-diagonal gradients are NOT all zero
    assert np.abs(g_enc0).max() > 0


def test_init_shapes_and_scales():
    params, codebook = vqvae.init_model(jax.random.PRNGKey(0), CFG)
    (w0, b0) = params['enc'][0]
    assert w0.shape == (6, 6, 7) and b0.shape == (6, 1, 7)
    assert codebook.shape == (6, 4, 9)
    # stacked-fan he_uniform limit: sqrt(6 / (n_var * fan_in))
    limit = np.sqrt(6.0 / (6 * 6))
    assert float(jnp.max(jnp.abs(w0))) <= limit + 1e-6
    assert float(jnp.max(jnp.abs(w0))) > 0.8 * limit  # actually fills range
    # codebook: VarianceScaling uniform limit sqrt(3 / (n_var * D))
    climit = np.sqrt(3.0 / (6 * 4))
    assert float(jnp.max(jnp.abs(codebook))) <= climit + 1e-6
    # per-network convention widens the range
    cfg2 = CFG._replace(fan_mode='per_network')
    params2, _ = vqvae.init_model(jax.random.PRNGKey(0), cfg2)
    assert float(jnp.max(jnp.abs(params2['enc'][0][0]))) > limit


def test_gather_variables_fts_path():
    """encode_codes on a gathered subset == subset of full encode_codes
    (the reference's fts partial-evaluation path, core/model.py:98-108)."""
    params, codebook = vqvae.init_model(jax.random.PRNGKey(7), CFG)
    y = jax.random.uniform(jax.random.PRNGKey(2), (13, CFG.n_var))
    full = vqvae.encode_codes(params, codebook, y, CFG)
    fts = jnp.asarray([4, 1, 3])
    sub_params, sub_codebook = vqvae.gather_variables(params, codebook, fts)
    sub = vqvae.encode_codes(sub_params, sub_codebook, y, CFG, var_ids=fts)
    np.testing.assert_array_equal(np.asarray(sub), np.asarray(full)[[4, 1, 3]])
    # per-selection states [F, B, n] also supported (the Gibbs case)
    y3 = jnp.stack([y, y * 0, y])[..., :]
    sub3 = vqvae.encode_codes(sub_params, sub_codebook, y3, CFG, var_ids=fts)
    np.testing.assert_array_equal(np.asarray(sub3)[0], np.asarray(full)[4])


def test_variable_depth_units():
    """The reference hardcodes 4 hidden layers (crashing on other depths,
    e.g. its own core/model.py:161 self-test); we support any depth."""
    for units in [(5,), (8, 6, 5), (9, 8, 7, 6, 5)]:
        cfg = CFG._replace(units=units)
        params, codebook = vqvae.init_model(jax.random.PRNGKey(0), cfg)
        y = jnp.ones((3, cfg.n_var))
        out = vqvae.apply_model(params, codebook, y, cfg)
        assert out.recon.shape == (cfg.n_var, 3, cfg.n_var)
        assert len(params['enc']) == len(units) + 1


def test_naive_quantizer_model():
    cfg = CFG._replace(quantizer='naive', dim=3)
    params, codebook = vqvae.init_model(jax.random.PRNGKey(0), cfg)
    assert codebook is None
    y = jax.random.uniform(jax.random.PRNGKey(3), (5, cfg.n_var))
    out = vqvae.apply_model(params, codebook, y, cfg)
    assert out.recon.shape == (cfg.n_var, 5, cfg.n_var)
    codes = vqvae.encode_codes(params, None, y, cfg)
    assert int(jnp.max(codes)) < cfg.effective_codes == 8


def test_activation_hook():
    """cfg.activation swaps the hidden nonlinearity (relu here, verified
    against a NumPy relu oracle on the encoder) — the FatDense activation
    surface (reference core/dense.py:46)."""
    import pytest
    cfg = CFG._replace(activation='relu')
    params, codebook = vqvae.init_model(jax.random.PRNGKey(0), cfg)
    y = np.random.default_rng(0).integers(
        0, 2, size=(5, cfg.n_var)).astype(np.float32)
    z = np.asarray(vqvae.encode(params, jnp.asarray(y), activation='relu'))
    # NumPy oracle for network 0
    x = y.copy()
    x[:, 0] = 0.0
    for w, b in params['enc']:
        x = np.maximum(x @ np.asarray(w[0]) + np.asarray(b[0]), 0.0)
    np.testing.assert_allclose(z[0], x, rtol=1e-5, atol=1e-6)
    # selu and relu forward passes genuinely differ
    z_selu = np.asarray(vqvae.encode(params, jnp.asarray(y)))
    assert not np.allclose(z, z_selu)
    with pytest.raises(ValueError, match='unknown activation'):
        vqvae.activation_fn('swoosh')


def test_l2_regularizer_shrinks_kernels():
    """l2_reg > 0 must pull dense kernel norms below the unregularized run
    after identical training (the kernel_regularizer hook,
    reference core/dense.py:50)."""
    from pgmvae_tpu.train import Trainer
    y = np.random.default_rng(1).integers(
        0, 2, size=(64, CFG.n_var)).astype(np.float32)

    def norms(cfg):
        tr = Trainer(cfg, 0.01, 16, len(y))
        st = tr.init_state(jax.random.PRNGKey(0))
        for e in range(5):
            st, _ = tr.run_epoch(st, jnp.asarray(y), jax.random.PRNGKey(e))
        return float(vqvae.l2_penalty(st.params))

    assert norms(CFG._replace(l2_reg=0.05)) < norms(CFG)


def test_first_layer_rank1_matches_masked():
    """The rank-1 first layer (one shared full-width matmul + diagonal
    correction, models/vqvae.py:_first_layer_rank1) is the same math as the
    masked leave-one-out layer: encoder outputs agree to float tolerance,
    full training trajectories stay equivalent, and the inert-diagonal
    invariant survives training (the diagonal's two gradient contributions
    cancel exactly)."""
    from pgmvae_tpu.train import Trainer
    rng = np.random.default_rng(7)
    y = rng.integers(0, 2, size=(48, CFG.n_var)).astype(np.float32)

    params, codebook = vqvae.init_model(jax.random.PRNGKey(3), CFG)
    z_masked = vqvae.encode(params, jnp.asarray(y), first_layer='masked')
    z_rank1 = vqvae.encode(params, jnp.asarray(y), first_layer='rank1')
    np.testing.assert_allclose(np.asarray(z_rank1), np.asarray(z_masked),
                               rtol=1e-5, atol=1e-5)

    # auto: masked below the HBM-budget threshold (rank1 is the measured-
    # slower out-of-memory fallback; see VqVaeConfig.first_layer)
    assert 4 * CFG.n_var * len(y) * CFG.n_var < vqvae.FIRST_LAYER_RANK1_BYTES
    z_auto = vqvae.encode(params, jnp.asarray(y), first_layer='auto')
    np.testing.assert_array_equal(np.asarray(z_auto), np.asarray(z_masked))

    def train(cfg):
        tr = Trainer(cfg, 0.01, 16, len(y))
        st = tr.init_state(jax.random.PRNGKey(0))
        for e in range(4):
            st, m = tr.run_epoch(st, jnp.asarray(y), jax.random.PRNGKey(e))
        return st, m

    st_m, m_m = train(CFG)
    st_r, m_r = train(CFG._replace(first_layer='rank1'))
    np.testing.assert_allclose(float(m_r.loss), float(m_m.loss),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_r.params),
                    jax.tree.leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)

    # inert diagonal: W1[v, v, :] of the trained rank1 run == its init
    # (the custom VJP pins the diagonal cotangent to its analytic zero)
    from pgmvae_tpu.train import Trainer
    st0 = Trainer(CFG, 0.01, 16, len(y)).init_state(jax.random.PRNGKey(0))
    w0_init = np.asarray(st0.params['enc'][0][0])
    w0_rank1 = np.asarray(st_r.params['enc'][0][0])
    idx = np.arange(CFG.n_var)
    np.testing.assert_array_equal(w0_rank1[idx, idx, :], w0_init[idx, idx, :])


def test_first_layer_rank1_stage2_codes_match():
    """encode_codes under cfg.first_layer='rank1' assigns the same discrete
    codes as the masked path (stage 2 depends only on these indices)."""
    cfg = CFG._replace(first_layer='rank1')
    params, codebook = vqvae.init_model(jax.random.PRNGKey(5), CFG)
    y = jnp.asarray(np.random.default_rng(2).integers(
        0, 2, size=(40, CFG.n_var)).astype(np.float32))
    c_masked = np.asarray(vqvae.encode_codes(params, codebook, y, CFG))
    c_rank1 = np.asarray(vqvae.encode_codes(params, codebook, y, cfg))
    np.testing.assert_array_equal(c_rank1, c_masked)
