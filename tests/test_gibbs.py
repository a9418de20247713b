"""CMLL Gibbs sampler tests (reference core/model.py:98-148 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from pgmvae_tpu.gibbs import (conditional_marginal_log_likelihood,
                              get_probability)
from pgmvae_tpu.models import VqVaeConfig, init_model, encode_codes

CFG = VqVaeConfig(n_var=9, units=(8, 6), dim=4, num_codes=5, quantizer='ema')


def test_get_probability_gathers_dist():
    params, codebook = init_model(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.uniform(size=(CFG.n_var, CFG.num_codes))
                       .astype(np.float32))
    fts = jnp.asarray([2, 5, 7])
    y = jnp.asarray(rng.integers(0, 2, size=(3, 11, CFG.n_var))
                    .astype(np.float32))
    prb = get_probability(params, codebook, CFG, dist, y, fts)
    # oracle: full-model codes for those variables, then dist lookup
    from pgmvae_tpu.models import gather_variables
    sp, sc = gather_variables(params, codebook, fts)
    codes = np.asarray(encode_codes(sp, sc, y, CFG, var_ids=fts))
    expect = np.asarray(dist)[np.asarray(fts)[:, None], codes]
    np.testing.assert_allclose(np.asarray(prb), expect, rtol=1e-6)


def test_cmll_uniform_dist_gives_half_marginals():
    """dist = 0.5 everywhere -> chain marginals ~0.5 -> CMLL ~ n*log(0.5)."""
    params, codebook = init_model(jax.random.PRNGKey(1), CFG)
    dist = np.full((CFG.n_var, CFG.num_codes), 0.5)
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2, size=(64, CFG.n_var)).astype(np.float32)
    cmll = conditional_marginal_log_likelihood(
        params, codebook, CFG, dist, x, p1=3, num_smp=400, burn_in=100,
        key=jax.random.PRNGKey(0))
    expect = CFG.n_var * np.log(0.5)
    assert abs(cmll - expect) < 0.25, (cmll, expect)


def test_cmll_deterministic_and_finite():
    params, codebook = init_model(jax.random.PRNGKey(2), CFG)
    rng = np.random.default_rng(2)
    dist = rng.uniform(0.1, 0.9, size=(CFG.n_var, CFG.num_codes))
    x = rng.integers(0, 2, size=(16, CFG.n_var)).astype(np.float32)
    a = conditional_marginal_log_likelihood(params, codebook, CFG, dist, x,
                                            p1=4, num_smp=50, burn_in=10,
                                            key=jax.random.PRNGKey(7))
    b = conditional_marginal_log_likelihood(params, codebook, CFG, dist, x,
                                            p1=4, num_smp=50, burn_in=10,
                                            key=jax.random.PRNGKey(7))
    assert a == b, 'counter-based PRNG must make CMLL reproducible'
    assert np.isfinite(a) and a < 0
    # ragged last block (9 vars, p1=4 -> vol = [4,4,1]) exercised above


def test_cmll_verbose_progress(capfd):
    """verbose=True prints sampling progress (the reference's tf.print
    behavior, core/model.py:141-142) and must not change the result."""
    params, codebook = init_model(jax.random.PRNGKey(3), CFG)
    rng = np.random.default_rng(3)
    dist = rng.uniform(0.1, 0.9, size=(CFG.n_var, CFG.num_codes))
    x = rng.integers(0, 2, size=(8, CFG.n_var)).astype(np.float32)
    quiet = conditional_marginal_log_likelihood(
        params, codebook, CFG, dist, x, p1=2, num_smp=6, burn_in=2,
        key=jax.random.PRNGKey(5))
    loud = conditional_marginal_log_likelihood(
        params, codebook, CFG, dist, x, p1=2, num_smp=6, burn_in=2,
        key=jax.random.PRNGKey(5), verbose=True)
    cap = capfd.readouterr()
    assert 'cmll sampling step' in cap.out + cap.err
    assert quiet == loud
