"""Kernel-level oracle tests for the VQ ops: NumPy references mirror the TF
semantics of reference core/quantizer.py (distances/argmin/ST/losses at
:44-58 and :134-161; EMA update incl. assign_moving_average zero-debias at
:143-152; naive quantizer at :179-201)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgmvae_tpu.ops import quantizer as q

N, B, D, K = 5, 17, 8, 13


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _np_distances(z, w):
    # naive O(nBKD) oracle
    n, b, d = z.shape
    k = w.shape[2]
    out = np.zeros((n, b, k), np.float32)
    for vi in range(n):
        for bi in range(b):
            diff = z[vi, bi][:, None] - w[vi]          # [D,K]
            out[vi, bi] = np.sum(diff ** 2, axis=0)
    return out


def test_distances_match_naive():
    z, w = np.asarray(_rand(0, N, B, D)), np.asarray(_rand(1, N, D, K))
    got = np.asarray(q.vq_distances(jnp.asarray(z), jnp.asarray(w)))
    np.testing.assert_allclose(got, _np_distances(z, w), rtol=2e-4, atol=2e-4)


def test_codes_and_quantize():
    z, w = _rand(2, N, B, D), _rand(3, N, D, K)
    idx = np.asarray(q.vq_codes(z, w))
    ref = np.argmin(_np_distances(np.asarray(z), np.asarray(w)), axis=2)
    np.testing.assert_array_equal(idx, ref)
    quantized = np.asarray(q.vq_quantize(w, jnp.asarray(idx)))
    wn = np.asarray(w)
    for vi in range(N):
        for bi in range(B):
            np.testing.assert_allclose(quantized[vi, bi], wn[vi, :, idx[vi, bi]])


def test_vq_losses_and_straight_through():
    z, w = _rand(4, N, B, D), _rand(5, N, D, K)
    out = q.vq_forward(z, w)
    quantized = q.vq_quantize(w, out.indices)
    np.testing.assert_allclose(np.asarray(out.e_loss),
                               np.mean((np.asarray(quantized) - np.asarray(z)) ** 2),
                               rtol=1e-6)
    # output == quantized up to the z + (q - z) float round-trip
    np.testing.assert_allclose(np.asarray(out.output), np.asarray(quantized),
                               rtol=1e-5, atol=1e-6)

    # grad(sum(output)) wrt z is exactly ones (ST estimator), zero wrt codebook
    gz = jax.grad(lambda zz: jnp.sum(q.vq_forward(zz, w).output))(z)
    np.testing.assert_allclose(np.asarray(gz), np.ones_like(gz), rtol=1e-6)
    gw = jax.grad(lambda ww: jnp.sum(q.vq_forward(z, ww).output))(w)
    np.testing.assert_allclose(np.asarray(gw), np.zeros_like(gw), atol=1e-7)

    # commitment loss gradient flows to z only; codebook loss to w only
    ge = jax.grad(lambda ww: q.vq_forward(z, ww).e_loss)(w)
    np.testing.assert_allclose(np.asarray(ge), np.zeros_like(ge), atol=1e-7)
    gq = jax.grad(lambda zz: q.vq_forward(zz, w).q_loss)(z)
    np.testing.assert_allclose(np.asarray(gq), np.zeros_like(gq), atol=1e-7)


def test_code_stats_matches_loop():
    z, w = _rand(6, N, B, D), _rand(7, N, D, K)
    idx = q.vq_codes(z, w)
    counts, dw = q.code_stats(z, idx, K)
    zc, ic = np.asarray(z), np.asarray(idx)
    ref_counts = np.zeros((N, K), np.float32)
    ref_dw = np.zeros((N, D, K), np.float32)
    for vi in range(N):
        for bi in range(B):
            ref_counts[vi, ic[vi, bi]] += 1
            ref_dw[vi, :, ic[vi, bi]] += zc[vi, bi]
    np.testing.assert_allclose(np.asarray(counts), ref_counts, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), ref_dw, rtol=1e-4, atol=1e-5)


def test_code_stats_weights_mask():
    z = _rand(8, N, B, D)
    idx = q.vq_codes(z, _rand(9, N, D, K))
    wts = jnp.asarray((np.arange(B) % 2).astype(np.float32))
    counts, dw = q.code_stats(z, idx, K, weights=wts)
    counts_ref, dw_ref = q.code_stats(z[:, 1::2], idx[:, 1::2], K)
    np.testing.assert_allclose(np.asarray(counts), np.asarray(counts_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-5)


class _NpEmaOracle:
    """TF-semantics oracle: assign_moving_average (optionally zero-debiased)
    on counts and dw, then Laplace-smoothed normalization
    (reference core/quantizer.py:143-152)."""

    def __init__(self, embeddings, decay, eps, zero_debias):
        self.w = embeddings.copy()
        self.decay, self.eps, self.zero_debias = decay, eps, zero_debias
        self.bc = np.zeros((embeddings.shape[0], embeddings.shape[2]), np.float64)
        self.bw = (np.zeros_like(embeddings, np.float64) if zero_debias
                   else embeddings.astype(np.float64))
        self.t = 0

    def step(self, counts, dw):
        d = self.decay
        self.bc = d * self.bc + (1 - d) * counts
        self.bw = d * self.bw + (1 - d) * dw
        self.t += 1
        if self.zero_debias:
            bias = 1 - d ** self.t
            ema_c, ema_w = self.bc / bias, self.bw / bias
        else:
            ema_c, ema_w = self.bc, self.bw
        k = self.w.shape[2]
        n = np.sum(ema_c, axis=1, keepdims=True)
        smoothed = (ema_c + self.eps) / (n + k * self.eps) * n
        self.w = (ema_w / smoothed[:, None, :]).astype(np.float32)
        return self.w


@pytest.mark.parametrize('zero_debias', [True, False])
def test_ema_update_matches_oracle(zero_debias):
    decay, eps = 0.97, 1e-5
    emb = np.asarray(_rand(10, N, D, K))
    oracle = _NpEmaOracle(emb, decay, eps, zero_debias)
    state = q.ema_init(jnp.asarray(emb), zero_debias)
    rng = np.random.default_rng(0)
    for step in range(6):
        z = jnp.asarray(rng.normal(size=(N, B, D)).astype(np.float32))
        idx = q.vq_codes(z, state.codebook)
        counts, dw = q.code_stats(z, idx, K)
        state = q.ema_update(state, counts, dw, decay, eps, zero_debias)
        ref_w = oracle.step(np.asarray(counts, np.float64),
                            np.asarray(dw, np.float64))
        np.testing.assert_allclose(np.asarray(state.codebook), ref_w,
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('zero_debias', [True, False])
def test_restart_dead_codes(zero_debias):
    emb = np.asarray(_rand(11, N, D, K))
    state = q.ema_init(jnp.asarray(emb), zero_debias)
    z = _rand(12, N, B, D)
    idx = q.vq_codes(z, state.codebook)
    counts, dw = q.code_stats(z, idx, K)
    state = q.ema_update(state, counts, dw, 0.9, zero_debias=zero_debias)

    before = np.asarray(state.codebook)
    usage = np.asarray(state.counts) / ((1 - 0.9 ** 1) if zero_debias else 1)
    dead = usage < 0.5  # with B=17 < K=13 some codes must be unused
    assert dead.any() and not dead.all()

    new = q.restart_dead_codes(state, z, jax.random.PRNGKey(0), 0.5, 0.9,
                               zero_debias=zero_debias)
    after = np.asarray(new.codebook)
    # live codes untouched; dead codes replaced by actual batch latents
    zn = np.asarray(z)
    for v in range(N):
        for k in range(K):
            if not dead[v, k]:
                np.testing.assert_array_equal(after[v, :, k], before[v, :, k])
            else:
                assert any(np.allclose(after[v, :, k], zn[v, b], atol=1e-6)
                           for b in range(B)), (v, k)
    # restarted stats: unbiased count 1, unbiased dw == new latent
    bias = (1 - 0.9 ** 1) if zero_debias else 1.0
    np.testing.assert_allclose(np.asarray(new.counts)[dead] / bias, 1.0,
                               rtol=1e-6)
    # reproducible
    again = q.restart_dead_codes(state, z, jax.random.PRNGKey(0), 0.5, 0.9,
                                 zero_debias=zero_debias)
    np.testing.assert_array_equal(np.asarray(again.codebook), after)


def test_restart_dead_codes_respects_weights():
    emb = _rand(13, N, D, K)
    state = q.ema_init(emb, True)
    z = _rand(14, N, B, D)
    idx = q.vq_codes(z, state.codebook)
    w = jnp.asarray(([1.0] * 3) + [0.0] * (B - 3))
    counts, dw = q.code_stats(z, idx, K, weights=w)
    state = q.ema_update(state, counts, dw, 0.9)
    new = q.restart_dead_codes(state, z, jax.random.PRNGKey(1), 0.5, 0.9,
                               weights=w)
    # every restarted vector must come from a weighted (valid) row
    zn, after = np.asarray(z), np.asarray(new.codebook)
    usage = np.asarray(state.counts) / (1 - 0.9)
    for v in range(N):
        for k in range(K):
            if usage[v, k] < 0.5:
                assert any(np.allclose(after[v, :, k], zn[v, b], atol=1e-6)
                           for b in range(3)), (v, k)


def test_naive_quantizer():
    z = jnp.asarray(np.array([[[0.1, 0.9, 0.6], [0.49, 0.51, 0.0]]],
                             np.float32))  # [1,2,3]
    out = q.naive_forward(z)
    np.testing.assert_allclose(np.asarray(out.output),
                               [[[0., 1., 1.], [0., 1., 0.]]], atol=1e-5)
    codes = np.asarray(q.naive_codes(z))
    # bits (LSB=dim 0): [0,1,1]->6, [0,1,0]->2
    np.testing.assert_array_equal(codes, [[6, 2]])
    np.testing.assert_allclose(float(out.e_loss),
                               np.mean(-(np.asarray(z) - 0.5) ** 2), rtol=1e-6)
