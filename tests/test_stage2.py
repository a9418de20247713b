"""Stage-2 tests: counting oracle, CPT/PLL formulas (reference
core/model.py:58-96), chunk invariance."""

import numpy as np
import jax

import jax.numpy as jnp

from pgmvae_tpu.models import VqVaeConfig, init_model, encode_codes
from pgmvae_tpu.stage2 import Stage2, SMOOTHING, LOG_EPS

CFG = VqVaeConfig(n_var=8, units=(7, 6), dim=4, num_codes=11, quantizer='ema')


def _setup(n_samples=57, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, size=(n_samples, CFG.n_var)).astype(np.float32)
    params, codebook = init_model(jax.random.PRNGKey(seed), CFG)
    return y, params, codebook


def _np_counts(params, codebook, y):
    """Oracle: per-sample loop mirroring reference core/model.py:58-82."""
    codes = np.asarray(encode_codes(params, codebook,
                                    jnp.asarray(y), CFG))  # [n, N]
    n1 = np.zeros((CFG.n_var, CFG.num_codes))
    n0 = np.zeros((CFG.n_var, CFG.num_codes))
    for v in range(CFG.n_var):
        for b in range(y.shape[0]):
            if y[b, v] == 1:
                n1[v, codes[v, b]] += 1
            else:
                n0[v, codes[v, b]] += 1
    return n1, n0


def test_counts_match_oracle():
    y, params, codebook = _setup()
    s2 = Stage2(CFG, chunk=16)  # force ragged padding (57 % 16 != 0)
    n1, n0 = s2.counts(params, codebook, y)
    rn1, rn0 = _np_counts(params, codebook, y)
    np.testing.assert_array_equal(n1, rn1)
    np.testing.assert_array_equal(n0, rn0)
    # every sample lands in exactly one (v, k) cell per variable
    np.testing.assert_array_equal((n1 + n0).sum(axis=1),
                                  np.full(CFG.n_var, len(y)))


def test_chunk_invariance():
    y, params, codebook = _setup(101, seed=3)
    a = Stage2(CFG, chunk=7).counts(params, codebook, y)
    b = Stage2(CFG, chunk=101).counts(params, codebook, y)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_cpt_and_pll_formulas():
    y, params, codebook = _setup(64, seed=1)
    s2 = Stage2(CFG, chunk=32)
    n1, n0 = s2.counts(params, codebook, y)
    dist = s2.cpt(params, codebook, y)
    np.testing.assert_allclose(dist, (n1 + SMOOTHING) / (n1 + n0 + 2 * SMOOTHING))
    assert dist.dtype == np.float64
    pll = s2.pseudo_log_likelihood(params, codebook, y, dist)
    ref = np.sum(n1 * np.log(dist + LOG_EPS)
                 + n0 * np.log(1 - dist + LOG_EPS)) / len(y)
    np.testing.assert_allclose(pll, ref, rtol=1e-12)
    assert pll < 0


def test_pll_perfect_predictor_bound():
    """A CPT concentrated on the data gives PLL near n_var*log(~1)."""
    y, params, codebook = _setup(40, seed=2)
    s2 = Stage2(CFG, chunk=40)
    n1, n0 = s2.counts(params, codebook, y)
    # construct the empirical (unsmoothed, clipped) CPT: best achievable
    dist = np.clip(n1 / np.maximum(n1 + n0, 1), 1e-9, 1 - 1e-9)
    pll_emp = s2.pseudo_log_likelihood(params, codebook, y, dist)
    dist_bad = np.full_like(dist, 0.5)
    pll_bad = s2.pseudo_log_likelihood(params, codebook, y, dist_bad)
    assert pll_emp > pll_bad
    np.testing.assert_allclose(pll_bad, CFG.n_var * np.log(0.5 + LOG_EPS),
                               rtol=1e-6)
