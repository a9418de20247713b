"""Pallas fused VQ kernel parity vs the XLA path (interpret mode on CPU;
compiled parity is exercised on real TPU by bench/e2e runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgmvae_tpu.ops.pallas_vq import vq_codes_fused
from pgmvae_tpu.ops.quantizer import vq_codes, vq_forward


@pytest.mark.parametrize('shape', [
    (3, 9, 5, 7),       # tiny, ragged everything
    (5, 32, 8, 130),    # K just past one lane tile
    (4, 17, 10, 50),    # nltcs-like
    (2, 64, 16, 1024),  # multiple K tiles
])
def test_fused_codes_match_xla(shape):
    n, b, d, k = shape
    z = jax.random.normal(jax.random.PRNGKey(0), (n, b, d))
    w = jax.random.normal(jax.random.PRNGKey(1), (n, d, k))
    ref = np.asarray(vq_codes(z, w))
    got = np.asarray(vq_codes_fused(z, w, block_b=16, block_k=256,
                                    interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_tie_breaking_lowest_index():
    # duplicate codebook entries -> argmin must pick the lowest index
    z = jnp.zeros((1, 8, 4))
    w = jnp.ones((1, 4, 12))  # all identical
    got = np.asarray(vq_codes_fused(z, w, interpret=True))
    np.testing.assert_array_equal(got, np.zeros((1, 8), np.int32))


def test_vq_forward_pallas_impl_grads():
    """The pallas impl must be usable under jax.grad (stop_gradient guards
    the kernel; gradients flow through the ST estimator as usual)."""
    z = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 4))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 4, 16))

    def loss(z):
        out = vq_forward(z, w, impl='pallas_interpret')
        return jnp.sum(out.output) + out.e_loss

    g = jax.grad(loss)(z)
    ref = jax.grad(lambda z: (lambda o: jnp.sum(o.output) + o.e_loss)(
        vq_forward(z, w, impl='xla')))(z)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_auto_impl_rule():
    """'auto' = XLA while the [n,B,K] f32 distance tensor fits comfortably
    (it wins every measured shape there — docs/design.md table), Pallas
    past AUTO_PALLAS_BYTES where XLA is OOM-infeasible."""
    from pgmvae_tpu.ops.quantizer import AUTO_PALLAS_BYTES, auto_impl
    assert auto_impl(16, 128, 50) == 'xla'
    assert auto_impl(1058, 1024, 512) == 'xla'      # 2.2 GB: fits, XLA won
    assert 4.0 * 1058 * 1024 * 4096 > AUTO_PALLAS_BYTES
    assert auto_impl(1058, 1024, 4096) == 'pallas'  # 17.7 GB: XLA OOM
    # 'auto' through the public entry point matches plain xla numerically
    z = jax.random.normal(jax.random.PRNGKey(4), (4, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 32))
    np.testing.assert_array_equal(np.asarray(vq_codes(z, w, impl='auto')),
                                  np.asarray(vq_codes(z, w, impl='xla')))
