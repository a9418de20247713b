"""Checkpoint round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pgmvae_tpu import checkpoint as ckpt
from pgmvae_tpu.models import VqVaeConfig
from pgmvae_tpu.train import Trainer

CFG = VqVaeConfig(n_var=5, units=(4, 3), dim=2, num_codes=4, quantizer='ema')


def _trained_state(cfg=CFG, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, size=(24, cfg.n_var)).astype(np.float32)
    tr = Trainer(cfg, 0.01, 8, len(y))
    st = tr.init_state(jax.random.PRNGKey(seed))
    st, _ = tr.run_epoch(st, jnp.asarray(y), jax.random.PRNGKey(1))
    return tr, st


def test_roundtrip_with_template(tmp_path):
    tr, st = _trained_state()
    dist = np.random.default_rng(0).uniform(size=(5, 4))
    path = str(tmp_path / 'm.ckpt')
    ckpt.save(path, CFG, st, dist, extra={'identifier': 'x'})
    cfg2, st2, dist2, extra = ckpt.load(
        path, state_template=tr.init_state(jax.random.PRNGKey(99)))
    assert cfg2 == CFG
    assert extra == {'identifier': 'x'}
    np.testing.assert_array_equal(dist, dist2)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert type(st2) is type(st) and st2.ema is not None
    # resumed state must be trainable
    tr.train_step(st2, jnp.zeros((8, 5), jnp.float32),
                  jnp.ones(8, jnp.float32))


def test_roundtrip_raw_and_no_dist(tmp_path):
    cfg = CFG._replace(quantizer='vq')
    tr, st = _trained_state(cfg, seed=3)
    path = str(tmp_path / 'm2.ckpt')
    ckpt.save(path, cfg, st)
    cfg2, raw, dist, extra = ckpt.load(path)
    assert dist is None and cfg2.quantizer == 'vq' and extra == {}
    # raw dict still exposes the codebook param for inference-only use
    assert 'params' in raw and 'codebook' in raw['params']


def test_rejects_garbage(tmp_path):
    p = tmp_path / 'bad.ckpt'
    p.write_bytes(b'not a checkpoint')
    try:
        ckpt.load(str(p))
        assert False, 'should have raised'
    except ValueError as e:  # a real raise, not an assert (stripped under -O)
        assert 'not a pgmvae checkpoint' in str(e)
