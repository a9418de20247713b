"""Vector-quantization ops, purely functional and batched over the variable
axis — the TPU-native core of the framework.

Semantics mirror the reference quantizers:
- distances / argmin / straight-through / commitment+codebook losses:
  reference `core/quantizer.py:44-58` (plain) and `:134-161` (EMA);
- EMA codebook update incl. Laplace-smoothed cluster sizes:
  reference `core/quantizer.py:143-152`, which calls TF's
  `moving_averages.assign_moving_average` (default `zero_debias=True` —
  Adam-style bias correction via a zero-initialized shadow accumulator and a
  step counter). We reproduce both the debiased default and the plain
  moving average (`zero_debias=False`);
- binary "naive" quantizer: reference `core/quantizer.py:179-201`.

Everything is a pure function of explicit arrays: no in-place `assign` inside
a forward pass (the reference mutates the codebook mid-forward at
`core/quantizer.py:152`; here the train step threads `EmaState` functionally,
which also makes multi-device EMA exact — statistics are summed across data
shards before the moving-average step).

Array conventions: z [n_var, B, D], codebook [n_var, D, K], indices
[n_var, B] int32, counts [n_var, K], dw [n_var, D, K].
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def vq_distances(z: jax.Array, codebook: jax.Array) -> jax.Array:
    """Squared L2 distances [n, B, K] = |z|^2 - 2 z.W + |W|^2.

    Matches reference `core/quantizer.py:44-46, 135-137`. The cross term is a
    batched matmul (MXU); the norms are rank-deficient broadcasts the compiler
    fuses into it.
    """
    z2 = jnp.sum(z * z, axis=2, keepdims=True)                       # [n,B,1]
    w2 = jnp.sum(codebook * codebook, axis=1, keepdims=True)         # [n,1,K]
    cross = jnp.einsum('nbd,ndk->nbk', z, codebook,
                       preferred_element_type=z.dtype)
    return z2 - 2.0 * cross + w2


# Above this distance-tensor size the XLA path's materialized [n, B, K]
# intermediate risks OOM on a 16 GB v5e (and is pure HBM-bandwidth waste);
# the Pallas kernel never materializes it. Below it XLA wins at every
# measured shape (scripts/bench_pallas_vq.py table, docs/design.md).
AUTO_PALLAS_BYTES = 4 << 30


def auto_impl(n_var: int, batch: int, num_codes: int) -> str:
    """'xla' while the f32 [n, B, K] distance tensor stays under
    AUTO_PALLAS_BYTES (XLA wins every measured shape there), 'pallas'
    beyond (XLA is OOM-infeasible there; the kernel streams K tiles
    through VMEM instead)."""
    nbytes = 4.0 * n_var * batch * num_codes
    return 'pallas' if nbytes > AUTO_PALLAS_BYTES else 'xla'


def vq_codes(z: jax.Array, codebook: jax.Array,
             impl: str = 'xla') -> jax.Array:
    """Nearest-codebook indices [n, B] (argmin over K; ties -> lowest index,
    matching `tf.argmin`).

    impl: 'xla' (XLA fuses the norms into the distance matmul on TPU and
    wins at every shape where the [n,B,K] distance tensor fits — measured
    table in docs/design.md), 'pallas' (fused VMEM kernel,
    ops/pallas_vq.py — never materializes [n,B,K], so it executes shapes
    XLA cannot, e.g. n=1058 B=1024 K=4096 = 17.7 GB), 'auto' (XLA below
    AUTO_PALLAS_BYTES, Pallas above), or 'pallas_interpret' (CPU tests).
    """
    if impl == 'auto':
        impl = auto_impl(z.shape[0], z.shape[1], codebook.shape[2])
    if impl in ('pallas', 'pallas_interpret'):
        from pgmvae_tpu.ops.pallas_vq import vq_codes_fused
        # argmin carries no gradient; stop_gradient keeps tangents out of the
        # kernel so it needs no JVP rule under jax.grad
        return vq_codes_fused(jax.lax.stop_gradient(z),
                              jax.lax.stop_gradient(codebook),
                              interpret=(impl == 'pallas_interpret'))
    return jnp.argmin(vq_distances(z, codebook), axis=2).astype(jnp.int32)


def vq_quantize(codebook: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather quantized latents [n, B, D] from per-variable codebooks."""
    return jnp.take_along_axis(
        jnp.swapaxes(codebook, 1, 2),                                # [n,K,D]
        indices[:, :, None], axis=1)


def _masked_mean(x: jax.Array, weights: Optional[jax.Array],
                 n_active: Optional[int] = None) -> jax.Array:
    """Mean over all elements, with optional per-batch-element weights on
    axis 1 (for ragged final batches; weight 1 == plain mean). With a padded
    variable axis, `n_active` excludes networks >= n_active from both the
    sum and the denominator."""
    n = x.shape[0]
    if n_active is not None and n_active < n:
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
        x = x * (row < n_active).astype(x.dtype)
        n = n_active
    if weights is None:
        return jnp.sum(x) / (n * x.shape[1] * x.shape[2])
    w = weights[None, :, None]
    denom = n * x.shape[2] * jnp.sum(weights)
    return jnp.sum(x * w) / denom


class VqOut(NamedTuple):
    output: jax.Array    # [n, B, D] straight-through quantized latents
    indices: jax.Array   # [n, B] code assignments
    e_loss: jax.Array    # commitment loss (scalar)
    q_loss: jax.Array    # codebook loss (scalar; 0 contribution in EMA mode)


def vq_forward(z: jax.Array, codebook: jax.Array,
               weights: Optional[jax.Array] = None,
               impl: str = 'xla',
               n_active: Optional[int] = None) -> VqOut:
    """Quantize with straight-through gradients and both latent losses.

    e_loss = mean((sg(q) - z)^2)   — commitment (ref quantizer.py:50,142)
    q_loss = mean((q - sg(z))^2)   — codebook   (ref quantizer.py:51)
    output = z + sg(q - z)         — ST estimator (ref quantizer.py:53,156)

    `n_active` masks padded variable-axis networks out of both losses.
    """
    indices = vq_codes(z, codebook, impl=impl)
    quantized = vq_quantize(codebook, indices)
    e_loss = _masked_mean((jax.lax.stop_gradient(quantized) - z) ** 2,
                          weights, n_active)
    q_loss = _masked_mean((quantized - jax.lax.stop_gradient(z)) ** 2,
                          weights, n_active)
    output = z + jax.lax.stop_gradient(quantized - z)
    return VqOut(output, indices, e_loss, q_loss)


def code_stats(z: jax.Array, indices: jax.Array, num_codes: int,
               weights: Optional[jax.Array] = None):
    """Per-variable assignment statistics for the EMA update:

    counts[v,k] = sum_b w_b * 1[indices[v,b]=k]     (ref quantizer.py:145)
    dw[v,:,k]   = sum_b w_b * z[v,b,:] * 1[...]     (ref quantizer.py:146)

    Computed via a one-hot einsum — a batched matmul on the MXU, exactly the
    shape of the reference's `matmul(inputs^T, encodings)`.
    """
    onehot = jax.nn.one_hot(indices, num_codes, dtype=z.dtype)       # [n,B,K]
    if weights is not None:
        onehot = onehot * weights[None, :, None]
    counts = jnp.sum(onehot, axis=1)                                 # [n,K]
    dw = jnp.einsum('nbd,nbk->ndk', z, onehot,
                    preferred_element_type=z.dtype)                  # [n,D,K]
    return counts, dw


class EmaState(NamedTuple):
    """Functional EMA-codebook state.

    With `zero_debias=True` (TF `assign_moving_average` default), `counts`
    and `dw` hold the *biased* shadow accumulators (zero-initialized) and
    `step` drives the Adam-style bias correction `1 - decay**step`. With
    `zero_debias=False` they hold the moving averages directly and `dw` is
    initialized from the codebook (ref quantizer.py:114-117).
    """
    codebook: jax.Array   # [n, D, K]
    counts: jax.Array     # [n, K]
    dw: jax.Array         # [n, D, K]
    step: jax.Array       # scalar int32


def ema_init(codebook: jax.Array, zero_debias: bool = True) -> EmaState:
    # jnp.copy: dw must be a DISTINCT buffer — aliasing the codebook array
    # breaks buffer donation in the epoch runner (same buffer donated twice)
    dw0 = jnp.zeros_like(codebook) if zero_debias else jnp.copy(codebook)
    return EmaState(codebook=codebook,
                    counts=jnp.zeros(
                        (codebook.shape[0], codebook.shape[2]), codebook.dtype),
                    dw=dw0,
                    step=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, batch_counts: jax.Array, batch_dw: jax.Array,
               decay: float, epsilon: float = 1e-5,
               zero_debias: bool = True) -> EmaState:
    """One EMA codebook update from batch statistics.

    Mirrors reference `core/quantizer.py:144-152`: moving averages of counts
    and dw, Laplace smoothing of cluster sizes, codebook = dw / counts. Under
    data parallelism, `batch_counts`/`batch_dw` must be the *global* (psum'd)
    statistics — with sharded inputs under jit, XLA inserts that reduction.
    """
    counts = state.counts * decay + batch_counts * (1.0 - decay)
    dw = state.dw * decay + batch_dw * (1.0 - decay)
    step = state.step + 1
    if zero_debias:
        bias = 1.0 - decay ** step.astype(state.codebook.dtype)
        ema_c, ema_w = counts / bias, dw / bias
    else:
        ema_c, ema_w = counts, dw
    k = state.codebook.shape[2]
    n = jnp.sum(ema_c, axis=1, keepdims=True)                        # [n,1]
    smoothed = (ema_c + epsilon) / (n + k * epsilon) * n             # [n,K]
    codebook = ema_w / smoothed[:, None, :]
    return EmaState(codebook=codebook, counts=counts, dw=dw, step=step)


def restart_dead_codes(state: EmaState, z: jax.Array, key: jax.Array,
                       threshold: float, decay: float,
                       zero_debias: bool = True,
                       weights: Optional[jax.Array] = None) -> EmaState:
    """Reseed dead codebook entries from random batch latents.

    A capability the reference lacks: its EMA quantizer lets unused codes
    decay toward zero and the codebook collapses on hard datasets (observed
    at perplexity 1.0 on bbc/students — the model degenerates to per-variable
    marginals). Standard VQ-VAE practice: any code whose (unbiased) EMA usage
    falls below `threshold` is restarted at a randomly drawn encoder latent
    from the current batch, with its EMA statistics reset to (count=1,
    dw=latent) so the next update treats it as freshly assigned.

    Deterministic given `key`. For exact data-parallel semantics the caller
    passes the same key on every shard; the drawn batch indices are global
    (z must be the full logical batch under GSPMD, which it is inside jit).
    """
    n, b, d = z.shape
    k = state.codebook.shape[2]
    if zero_debias:
        step = jnp.maximum(state.step, 1).astype(state.codebook.dtype)
        bias = 1.0 - decay ** step
    else:
        bias = jnp.ones((), state.codebook.dtype)
    usage = state.counts / bias                                  # [n, K]
    dead = usage < threshold                                     # [n, K]
    # one random (valid) batch row per (variable, code)
    if weights is None:
        ridx = jax.random.randint(key, (n, k), 0, b)
    else:
        logits = jnp.where(weights > 0, 0.0, -jnp.inf)
        ridx = jax.random.categorical(key, logits, shape=(n, k))
    candidates = jnp.take_along_axis(z, ridx[:, :, None], axis=1)  # [n,K,D]
    candidates = jnp.swapaxes(candidates, 1, 2)                    # [n,D,K]
    dead_dk = dead[:, None, :]
    codebook = jnp.where(dead_dk, candidates, state.codebook)
    counts = jnp.where(dead, bias * 1.0, state.counts)
    dw = jnp.where(dead_dk, bias * candidates, state.dw)
    return EmaState(codebook=codebook, counts=counts, dw=dw, step=state.step)


# --------------------------------------------------------------------------
# Binary "naive" quantizer (ref core/quantizer.py:179-201): the codebook is
# implicitly the corners of the D-cube, K = 2**D.
# --------------------------------------------------------------------------

class NaiveOut(NamedTuple):
    output: jax.Array
    e_loss: jax.Array


def naive_forward(z: jax.Array,
                  weights: Optional[jax.Array] = None,
                  n_active: Optional[int] = None) -> NaiveOut:
    """loss = mean(-(z-0.5)^2) (pushes latents to 0/1, ref :193); output is a
    hard 0/1 step via the reference's clamp trick (ref :194)."""
    e_loss = _masked_mean(-((z - 0.5) ** 2), weights, n_active)
    output = jnp.minimum(jnp.maximum(z - 0.499999, 0.0) * 1e7, 1.0)
    return NaiveOut(output, e_loss)


def naive_codes(z: jax.Array) -> jax.Array:
    """Code index = binary integer of rounded latent bits (ref :197).

    Deliberate fix vs the reference: selu latents can leave [0,1], and the
    reference's raw `round(z)` then produces out-of-range code indices whose
    one-hots silently vanish (zero stage-2 counts). We clip the rounded bits
    to the D-cube corners {0,1}, which is the quantizer's stated intent
    (ref core/quantizer.py:188-197).
    """
    dim = z.shape[-1]
    power = (2 ** jnp.arange(dim, dtype=jnp.int32))
    bits = jnp.clip(jnp.round(z), 0.0, 1.0).astype(jnp.int32)
    return jnp.sum(bits * power, axis=-1).astype(jnp.int32)
