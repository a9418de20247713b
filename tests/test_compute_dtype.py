"""bf16 compute mode (VqVaeConfig.compute_dtype='bf16').

Opt-in mixed precision: bfloat16 forward/backward with f32 master params,
Adam moments, EMA statistics, loss reductions, and stage 2 (train.py
_train_step_impl). Recorded in identifiers as cd-bf16 because the
trajectory genuinely differs from f32 (activation rounding, possibly argmin
assignments) — unlike ad-fused's fusion ULPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pgmvae_tpu.driver import ExperimentConfig
from pgmvae_tpu.models import VqVaeConfig
from pgmvae_tpu.train import Trainer
from pgmvae_tpu.utils.logging import parse_identifier


def test_identifier_roundtrip():
    kw = dict(name='nltcs', embedding=8, dim=4, batch=32, epoch=2, rate=0.01,
              cost=0.25, ema=True, decay=0.99, seed=1)
    c = ExperimentConfig(**kw, compute_dtype='bf16')
    assert c.identifier.endswith('_cd-bf16')
    back = parse_identifier(c.identifier)
    assert back['compute_dtype'] == 'bf16'
    # composes with other extensions in append order (ad- before cd-)
    c2 = ExperimentConfig(**kw, compute_dtype='bf16', adam_impl='fused')
    assert c2.identifier.endswith('_ad-fused_cd-bf16')
    assert parse_identifier(c2.identifier)['adam_impl'] == 'fused'
    # default leaves the identifier untouched
    assert '_cd-' not in ExperimentConfig(**kw).identifier


@pytest.mark.parametrize('quantizer', ['ema', 'vq'])
def test_bf16_trains_and_masters_stay_f32(quantizer):
    cfg32 = VqVaeConfig(n_var=6, units=(5, 4), dim=3, num_codes=7, cost=0.25,
                        decay=0.9, quantizer=quantizer)
    cfg16 = cfg32._replace(compute_dtype='bf16')
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 2, size=(64, 6)).astype(np.float32))

    losses = {}
    for cfg in (cfg32, cfg16):
        tr = Trainer(cfg, 0.01, 16, 64)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, ms = tr.fit(state, y, epochs=8, key=jax.random.PRNGKey(1))
        # master params / moments / EMA stay f32
        assert all(l.dtype == jnp.float32
                   for l in jax.tree_util.tree_leaves(state.params))
        if quantizer == 'ema':
            assert state.ema.codebook.dtype == jnp.float32
            assert state.ema.counts.dtype == jnp.float32
        # loss/metric accumulation is f32
        assert all(np.isfinite(m.loss) for m in ms)
        losses[cfg.compute_dtype] = float(ms[-1].loss)
    # bf16 tracks the f32 dynamics loosely (a sanity band, not parity —
    # the trajectory is legitimately different)
    assert abs(losses['bf16'] - losses['f32']) < 0.1 * abs(
        losses['f32']) + 5e-3, losses


def test_bf16_end_to_end_quality():
    """Driver-level: a bf16 nltcs cell lands in the same PLL ballpark as
    f32 (the mode's promise: throughput knob, not a quality cliff)."""
    from pgmvae_tpu.driver import run_experiment

    kw = dict(name='nltcs', embedding=16, dim=6, batch=256, epoch=4,
              rate=0.01, ema=True, decay=0.99, seed=0)
    r32 = run_experiment(ExperimentConfig(**kw))
    r16 = run_experiment(ExperimentConfig(**kw, compute_dtype='bf16'))
    assert r16['identifier'].endswith('_cd-bf16')
    assert np.isfinite(r16['pll_test'])
    assert abs(r16['pll_test'] - r32['pll_test']) < 0.35, (r32, r16)
