"""Fused nearest-codebook search as a Pallas TPU kernel.

The hot op of stage 1 is the per-variable codebook argmin (reference
`core/quantizer.py:135-138`): for z [n,B,D] and codebooks W [n,D,K] find
argmin_k |z - W[:,k]|^2. Under plain XLA the [n,B,K] distance tensor is a
matmul output that must round-trip HBM before the argmin reduction — at the
reference's sweep sizes (K=4096, `batch-job.sh:46`) that is hundreds of MB of
traffic per step. This kernel keeps each [TB,TK] score tile in VMEM, runs the
MXU matmul and the running min/argmin in one pass, and writes only the [n,B]
int32 indices.

Algebraic simplification: argmin_k (|z|^2 - 2 z.W_k + |W_k|^2) does not
depend on |z|^2, so the kernel scores only -2 z.W + |W|^2 (fewer FLOPs and
one less broadcast than the reference formula; identical argmin).

Tie-breaking matches `tf.argmin`/`jnp.argmin` (lowest index): within a tile
via jnp.argmin, across tiles via strict < on the running best.

Gradients: indices are integral (no gradient); the differentiable pieces
(gather, straight-through, losses) are computed outside from the indices, so
no custom VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vq_argmin_kernel(z_ref, w_ref, out_ref, *, num_codes: int, block_k: int):
    """One (variable, batch-tile) program: full-K running argmin."""
    z = z_ref[0]                                   # [TB, D]
    tb = z.shape[0]
    num_k_tiles = pl.cdiv(num_codes, block_k)

    def body(kt, carry):
        best_val, best_idx = carry                 # [TB,1] f32, [TB,1] i32
        k0 = kt * block_k
        w = w_ref[0, :, pl.ds(k0, block_k)]        # [D, TK]
        w2 = jnp.sum(w * w, axis=0, keepdims=True)  # [1, TK]
        scores = w2 - 2.0 * jnp.dot(z, w, preferred_element_type=jnp.float32)
        # mask lanes past K (padded tail tile)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + k0
        scores = jnp.where(col < num_codes, scores, jnp.inf)
        lmin = jnp.min(scores, axis=1, keepdims=True)            # [TB,1]
        lidx = jnp.argmin(scores, axis=1).astype(jnp.int32)      # [TB]
        lidx = lidx.reshape(tb, 1) + k0
        take = lmin < best_val
        return (jnp.where(take, lmin, best_val),
                jnp.where(take, lidx, best_idx))

    init = (jnp.full((tb, 1), jnp.inf, jnp.float32),
            jnp.zeros((tb, 1), jnp.int32))
    _, best_idx = jax.lax.fori_loop(0, num_k_tiles, body, init)
    out_ref[0, :, :] = best_idx


@functools.partial(jax.jit, static_argnames=('block_b', 'block_k',
                                             'interpret'))
def vq_codes_fused(z: jax.Array, codebook: jax.Array, block_b: int = 256,
                   block_k: int = 512, interpret: bool = False) -> jax.Array:
    """Nearest-codebook indices [n, B] via the fused Pallas kernel.

    Drop-in equivalent of `ops.quantizer.vq_codes` (same argmin, same
    tie-breaking). z [n,B,D] float32, codebook [n,D,K] float32.
    """
    n, b, d = z.shape
    k = codebook.shape[2]
    tb = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, tb)
    tk = min(block_k, _round_up(k, 128))
    k_pad = _round_up(k, tk)
    if b_pad != b:
        z = jnp.pad(z, ((0, 0), (0, b_pad - b), (0, 0)))
    if k_pad != k:
        # zero-pad codes past K; the in-kernel col<K mask keeps them inert
        codebook = jnp.pad(codebook, ((0, 0), (0, 0), (0, k_pad - k)))
    grid = (n, b_pad // tb)
    out = pl.pallas_call(
        functools.partial(_vq_argmin_kernel, num_codes=k, block_k=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tb, d), lambda v, bt: (v, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, k_pad), lambda v, bt: (v, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # rank-3 (.., tb, 1) output: TPU block constraints only bind the last
        # two dims, letting the (variable, batch-tile) block stay (1, tb)
        out_specs=pl.BlockSpec((1, tb, 1), lambda v, bt: (v, bt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, b_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * b_pad * d * k,
            bytes_accessed=4 * n * (b_pad * d + d * k + b_pad),
            transcendentals=0),
        interpret=interpret,
    )(z, codebook)
    return out[:, :b, 0]
