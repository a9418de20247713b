"""Model-level tests: the batched model must be exactly n_var independent
MLPs (the reference's core capability, reference core/dense.py:15-111), plus
init-scale and variable-subset (fts) behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from pgmvae_tpu.models import vqvae
from pgmvae_tpu.ops import quantizer as q

CFG = vqvae.VqVaeConfig(n_var=6, units=(7, 5), dim=4, num_codes=9,
                        cost=0.25, decay=0.99, quantizer='ema')


def _np_selu(x):
    alpha, scale = 1.6732632423543772, 1.0507009873554805
    return scale * np.where(x > 0, x, alpha * (np.exp(x) - 1))


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_single_forward(params, codebook, x_v, v):
    """Independent per-variable MLP in NumPy using variable v's weight slices."""
    h = x_v
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
    x = jax.random.normal(jax.random.PRNGKey(1), (CFG.n_var, 11, CFG.n_var - 1))
    out = vqvae.apply_model(params, codebook, x, CFG)
    xn = np.asarray(x)
    for v in range(CFG.n_var):
        recon_v, idx_v = _np_single_forward(params, codebook, xn[v], v)
        np.testing.assert_allclose(np.asarray(out.recon)[v], recon_v,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out.indices)[v], idx_v)


def test_init_shapes_and_scales():
    params, codebook = vqvae.init_model(jax.random.PRNGKey(0), CFG)
    (w0, b0) = params['enc'][0]
    assert w0.shape == (6, 5, 7) and b0.shape == (6, 1, 7)
    assert codebook.shape == (6, 4, 9)
    # stacked-fan he_uniform limit: sqrt(6 / (n_var * fan_in))
    limit = np.sqrt(6.0 / (6 * 5))
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
    x = jax.random.normal(jax.random.PRNGKey(2), (CFG.n_var, 13, CFG.n_var - 1))
    full = vqvae.encode_codes(params, codebook, x, CFG)
    fts = jnp.asarray([4, 1, 3])
    sub_params, sub_codebook = vqvae.gather_variables(params, codebook, fts)
    sub = vqvae.encode_codes(sub_params, sub_codebook, x[jnp.asarray([4, 1, 3])],
                             CFG)
    np.testing.assert_array_equal(np.asarray(sub), np.asarray(full)[[4, 1, 3]])


def test_variable_depth_units():
    """The reference hardcodes 4 hidden layers (crashing on other depths,
    e.g. its own core/model.py:161 self-test); we support any depth."""
    for units in [(5,), (8, 6, 5), (9, 8, 7, 6, 5)]:
        cfg = CFG._replace(units=units)
        params, codebook = vqvae.init_model(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((cfg.n_var, 3, cfg.n_var - 1))
        out = vqvae.apply_model(params, codebook, x, cfg)
        assert out.recon.shape == (cfg.n_var, 3, cfg.n_var - 1)
        assert len(params['enc']) == len(units) + 1


def test_naive_quantizer_model():
    cfg = CFG._replace(quantizer='naive', dim=3)
    params, codebook = vqvae.init_model(jax.random.PRNGKey(0), cfg)
    assert codebook is None
    x = jax.random.normal(jax.random.PRNGKey(3), (cfg.n_var, 5, cfg.n_var - 1))
    out = vqvae.apply_model(params, codebook, x, cfg)
    assert out.recon.shape == (cfg.n_var, 5, cfg.n_var - 1)
    codes = vqvae.encode_codes(params, None, x, cfg)
    assert int(jnp.max(codes)) < cfg.effective_codes == 8
