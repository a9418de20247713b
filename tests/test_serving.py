"""Serving API tests: checkpoint -> PgmModel -> per-sample scores must be
consistent with stage-2 aggregates."""

import numpy as np
import jax

from pgmvae_tpu import checkpoint as ckpt
from pgmvae_tpu.models import VqVaeConfig
from pgmvae_tpu.serving import PgmModel
from pgmvae_tpu.stage2 import Stage2
from pgmvae_tpu.train import Trainer

CFG = VqVaeConfig(n_var=7, units=(6, 5), dim=3, num_codes=6, quantizer='ema')


def _trained(tmp_path):
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, size=(80, CFG.n_var)).astype(np.float32)
    tr = Trainer(CFG, 0.01, 16, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    st, _ = tr.fit(st, y, 3, jax.random.PRNGKey(0))
    s2 = Stage2(CFG, chunk=32)
    dist = s2.cpt(st.params, tr.codebook(st), y)
    path = str(tmp_path / 'model.ckpt')
    ckpt.save(path, CFG, st, dist)
    return y, st, tr, s2, dist, path


def test_score_matches_stage2_aggregate(tmp_path):
    y, st, tr, s2, dist, path = _trained(tmp_path)
    model = PgmModel.from_checkpoint(path)
    scores = model.score(y)
    assert scores.shape == (80,)
    agg = s2.pseudo_log_likelihood(st.params, tr.codebook(st), y, dist)
    np.testing.assert_allclose(scores.mean(), agg, rtol=1e-5)


def test_codes_and_conditionals(tmp_path):
    y, st, tr, s2, dist, path = _trained(tmp_path)
    model = PgmModel.from_checkpoint(path)
    codes = model.codes(y[:10])
    assert codes.shape == (10, CFG.n_var)
    assert codes.min() >= 0 and codes.max() < CFG.num_codes

    # conditional for variable 3 on full-width samples == dist lookup
    prb = model.conditional_probability(y[:10], [3])
    expect = dist[3, codes[:, 3]]
    np.testing.assert_allclose(prb[0], expect.astype(np.float32), rtol=1e-5)


def test_from_checkpoint_requires_dist(tmp_path):
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, size=(16, CFG.n_var)).astype(np.float32)
    tr = Trainer(CFG, 0.01, 16, len(y))
    st = tr.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / 'nodist.ckpt')
    ckpt.save(path, CFG, st)  # no dist
    try:
        PgmModel.from_checkpoint(path)
        assert False
    except ValueError as e:
        assert 'no CPT' in str(e)
