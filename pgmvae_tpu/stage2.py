"""Stage 2: conditional probability tables from discrete codes, and
pseudo-log-likelihood (PLL).

Semantics (reference `core/model.py:58-96`, driven at `run.py:66-72`):

  n1[v,k] = #{samples b : code_v(x_{b,-v}) = k and y[b,v] = 1}
  n0[v,k] = likewise with y[b,v] = 0
  cpt     = (n1 + 0.8) / (n1 + n0 + 1.6)          # additive smoothing a=0.8
  PLL(split) = sum_{v,k} n1*log(dist+1e-5) + n0*log(1-dist+1e-5)  / N_split

where `dist` is always the CPT estimated on the *train* split.

TPU-native implementation: the reference loops 200-sample Python chunks and
reduces with `map_fn(boolean_mask)` (reference `core/model.py:61-80`) — an
implementation artifact. Here the whole dataset is counted in ONE jitted
`lax.scan` over device-resident chunks; each chunk is an encoder pass plus a
one-hot einsum (`n1 = einsum('nbk,bn->nk', onehot*w, y)`), so the hot work is
batched matmuls on the MXU. Counts are integer-valued and exactly
representable in f32 (N <= 291k << 2^24), accumulated on device in f32 and
finished on the host in float64 — which makes the CPT/PLL arithmetic match
the reference's float64 path bit-for-bit given equal counts.

Under data parallelism the chunk axis is sharded over 'data' and the count
reduction psum happens inside the einsum via GSPMD.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pgmvae_tpu.models import vqvae
from pgmvae_tpu.parallel.mesh import MeshContext

SMOOTHING = 0.8     # reference core/model.py:88
LOG_EPS = 1e-5      # reference core/model.py:93-94


def auto_chunk(n_var: int, num_codes: int, budget_bytes: int = 1 << 28) -> int:
    """Chunk size bounding per-chunk device buffers to ~256 MB.

    The dominant f32 buffers per chunk row are the leave-one-out views
    [n_var, chunk, n_var-1], the one-hot [n_var, chunk, K], and the first
    hidden activation [n_var, chunk, u0<=256]."""
    per_row = max(1, n_var * (n_var + num_codes + 256) * 4)
    return int(max(32, min(8192, budget_bytes // per_row)))


class Stage2:
    """Caches the jitted counting scan per (config, chunk)."""

    def __init__(self, cfg: vqvae.VqVaeConfig, chunk: Optional[int] = None,
                 mesh_ctx: Optional[MeshContext] = None):
        self.cfg = cfg
        self.k = cfg.effective_codes
        self.chunk = int(chunk or auto_chunk(cfg.n_var, self.k))
        self.mesh = mesh_ctx or MeshContext(None)
        self._count = jax.jit(self._count_impl)

    def _count_impl(self, params, codebook, y, w):
        with jax.default_matmul_precision(self.cfg.matmul_precision):
            return self._count_body(params, codebook, y, w)

    def _count_body(self, params, codebook, y, w):
        """y [steps*chunk, n_var] padded, w [steps*chunk] validity weights."""
        cfg, k, chunk = self.cfg, self.k, self.chunk
        steps = y.shape[0] // chunk
        ys = y.reshape(steps, chunk, cfg.n_var)
        ws = w.reshape(steps, chunk)

        def body(carry, inp):
            n1, n0 = carry
            yb, wb = inp
            yb = self.mesh.constrain(yb, self.mesh.batch)
            codes = vqvae.encode_codes(params, codebook, yb, cfg)  # [n,B]
            onehot = jax.nn.one_hot(codes, k, dtype=yb.dtype)      # [n,B,K]
            onehot = onehot * wb[None, :, None]
            n1 = n1 + jnp.einsum('nbk,bn->nk', onehot, yb,
                                 preferred_element_type=jnp.float32)
            n0 = n0 + jnp.einsum('nbk,bn->nk', onehot, 1.0 - yb,
                                 preferred_element_type=jnp.float32)
            return (n1, n0), None

        init = (jnp.zeros((cfg.n_var, k), jnp.float32),
                jnp.zeros((cfg.n_var, k), jnp.float32))
        (n1, n0), _ = jax.lax.scan(body, init, (ys, ws))
        return n1, n0

    def counts(self, params, codebook, y_host: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Dataset code/label co-occurrence counts as float64 [n_var, K]."""
        n = y_host.shape[0]
        steps = math.ceil(n / self.chunk)
        # bucket the scan length to the next power of two so differently
        # sized splits (train/valid/test) share one compiled program —
        # padded rows carry weight 0 and are exact no-ops in the counts
        steps = 1 << max(steps - 1, 0).bit_length()
        pad = steps * self.chunk - n
        y = np.pad(y_host.astype(np.float32), ((0, pad), (0, 0)))
        w = np.pad(np.ones(n, np.float32), (0, pad))
        n1, n0 = self._count(params, codebook, jnp.asarray(y), jnp.asarray(w))
        return (np.asarray(jax.device_get(n1), np.float64),
                np.asarray(jax.device_get(n0), np.float64))

    def cpt(self, params, codebook, y_train: np.ndarray) -> np.ndarray:
        """Smoothed conditional probability table p(y_v=1 | code=k),
        float64 [n_var, K] (reference core/model.py:85-88)."""
        n1, n0 = self.counts(params, codebook, y_train)
        return (n1 + SMOOTHING) / (n1 + n0 + 2 * SMOOTHING)

    def pseudo_log_likelihood(self, params, codebook, y_host: np.ndarray,
                              dist: np.ndarray) -> float:
        """Average per-sample PLL of a split under `dist` (reference
        core/model.py:91-96): counts come from this split, `dist` from
        train."""
        n1, n0 = self.counts(params, codebook, y_host)
        lp1 = np.log(dist + LOG_EPS)
        lp0 = np.log(1.0 - dist + LOG_EPS)
        return float(np.sum(n1 * lp1 + n0 * lp0) / y_host.shape[0])
