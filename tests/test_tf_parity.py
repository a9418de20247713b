"""Direct numerical parity against the ACTUAL TF2 reference.

BASELINE.json's north star asks for reconstruction/PLL parity to 1e-4. RNG
streams differ across frameworks, so per-step training parity is undefined —
but math parity is testable directly: install the SAME weights in both
implementations and demand the same forward pass, the same code assignments,
and the same stage-2 counts/CPT/PLL.

The reference model is imported unmodified from the read-only mount
(/root/reference, `core/model.py:14-55`); its stacked FatDense kernels
[n_var, in, out] map 1:1 onto our params except the first/last layers, where
our padded design ([n_var, n_var, u] with an inert diagonal row/column —
models/vqvae.py module doc) embeds the reference's gathered [n_var, n_var-1]
layout by scattering rows/columns to their original variable positions.

Skipped when TF or the reference mount is unavailable.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgmvae_tpu.models import VqVaeConfig, vqvae
from pgmvae_tpu.stage2 import Stage2

tf = pytest.importorskip('tensorflow')

REF = os.environ.get('PGMVAE_REFERENCE', '/root/reference')
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, 'core')),
    reason='reference mount not available')

N_VAR, UNITS, DIM, K = 8, (7, 6, 5, 4), 3, 11
N_SAMP = 120


@pytest.fixture(scope='module')
def ref_model_and_data():
    import sys
    sys.path.insert(0, REF)
    from core.model import VqVAE  # noqa: E402 — reference, unmodified

    tf.random.set_seed(7)
    rng = np.random.default_rng(7)
    y = rng.integers(0, 2, size=(N_SAMP, N_VAR)).astype(np.float32)
    # reference leave-one-out views [N, n, n-1] (run.py:46-50 semantics)
    x = np.stack([np.stack([row[[j for j in range(N_VAR) if j != v]]
                            for v in range(N_VAR)]) for row in y])
    model = VqVAE(units=list(UNITS), nvar=N_VAR, dim=DIM, k=K,
                  cost=0.25, decay=0.99, ema=True)
    _ = model(tf.constant(x[:4]))          # build weights
    return model, x, y


def _pack_params(model):
    """Map reference FatDense weights into our padded params pytree."""
    def wb(fd):
        return fd.kernel.numpy(), fd.bias.numpy()

    k0, b0 = wb(model.fd0)                 # [n, n-1, u0], [n, 1, u0]
    K0 = np.zeros((N_VAR, N_VAR, k0.shape[2]), np.float32)
    for v in range(N_VAR):
        idx = [j for j in range(N_VAR) if j != v]
        K0[v, idx, :] = k0[v]
    enc = [(jnp.asarray(K0), jnp.asarray(b0))]
    enc += [tuple(map(jnp.asarray, wb(fd)))
            for fd in (model.fd1, model.fd2, model.fd3, model.fd4)]

    dec = [tuple(map(jnp.asarray, wb(fd)))
           for fd in (model.fd5, model.fd6, model.fd7, model.fd8)]
    k9, b9 = wb(model.fd9)                 # [n, h, n-1], [n, 1, n-1]
    K9 = np.zeros((N_VAR, k9.shape[1], N_VAR), np.float32)
    B9 = np.zeros((N_VAR, 1, N_VAR), np.float32)
    for v in range(N_VAR):
        idx = [j for j in range(N_VAR) if j != v]
        K9[v][:, idx] = k9[v]
        B9[v, 0, idx] = b9[v, 0]
    dec.append((jnp.asarray(K9), jnp.asarray(B9)))

    codebook = jnp.asarray(model.vq_layer.embeddings.numpy())  # [n, D, K]
    return {'enc': enc, 'dec': dec}, codebook


CFG = VqVaeConfig(n_var=N_VAR, units=UNITS, dim=DIM, num_codes=K,
                  cost=0.25, decay=0.99, quantizer='ema',
                  matmul_precision='highest')


def test_forward_recon_parity(ref_model_and_data):
    model, x, y = ref_model_and_data
    params, codebook = _pack_params(model)

    ref_out = model(tf.constant(x)).numpy()           # [B, n, n-1]
    out = vqvae.apply_model(params, codebook, jnp.asarray(y), CFG)
    ours = np.asarray(out.recon)                      # [n, B, n]

    for v in range(N_VAR):
        idx = [j for j in range(N_VAR) if j != v]
        np.testing.assert_allclose(ours[v][:, idx], ref_out[:, v, :],
                                   atol=1e-4, rtol=1e-4)


def test_code_assignment_parity(ref_model_and_data):
    model, x, y = ref_model_and_data
    params, codebook = _pack_params(model)

    ref_onehot = model(tf.constant(x), code_only=True).numpy()  # [n, B, K]
    ref_codes = np.argmax(ref_onehot, axis=-1)
    ours = np.asarray(vqvae.encode_codes(params, codebook,
                                         jnp.asarray(y), CFG))
    np.testing.assert_array_equal(ours, ref_codes)


def test_stage2_counts_cpt_pll_parity(ref_model_and_data):
    model, x, y = ref_model_and_data
    params, codebook = _pack_params(model)

    rn1, rn0 = model.count(tf.constant(x), tf.constant(y))
    rn1, rn0 = rn1.numpy(), rn0.numpy()
    s2 = Stage2(CFG, chunk=64)
    n1, n0 = s2.counts(params, codebook, y)
    np.testing.assert_array_equal(n1, rn1)
    np.testing.assert_array_equal(n0, rn0)

    ref_dist = model.cpt(tf.constant(x), tf.constant(y)).numpy()
    dist = s2.cpt(params, codebook, y)
    np.testing.assert_allclose(dist, ref_dist, rtol=1e-12, atol=0)

    model.dist = tf.constant(ref_dist, tf.float64)
    ref_pll = float(model.pseudo_log_likelihood(tf.constant(x),
                                                tf.constant(y)))
    pll = s2.pseudo_log_likelihood(params, codebook, y, dist)
    assert abs(pll - ref_pll) < 1e-6, (pll, ref_pll)
