"""The batched multi-network VQ-VAE: `n_var` independent dense autoencoders
trained as ONE model.

This is the TPU-native re-design of the reference's FatDense/VqVAE stack
(reference `core/dense.py:15-111`, `core/model.py:14-55`): instead of a Keras
layer object holding stacked kernels, the whole model is a pure function of a
params pytree whose every leaf carries a leading `n_var` axis. Dense layers
are batched matmuls `[n,B,i] x [n,i,o]` — rank-3 `dot_general`s that XLA maps
straight onto the MXU, with bias+SELU fused in. The variable axis is also the
model-parallel sharding axis (each device owns a contiguous slice of
independent autoencoders — zero cross-device traffic in the forward/backward).

Architecture (reference `core/model.py:19-36`):
  encoder: Dense(units[0..L-1], selu, he_uniform) -> Dense(dim, selu)
  quantizer: EMA VQ / plain VQ (per-variable codebook [n,D,K]) / naive binary
  decoder: Dense(units[L-1..0], selu) -> Dense(n_var-1, sigmoid, glorot)

The reference hardcodes exactly 4 hidden widths (and crashes on fewer, e.g.
its own `core/model.py:161` self-test); we accept any depth >= 1.

Leave-one-out layout — the **padded masked design** (deliberately different
from the reference's gathered `[n, B, n-1]` views, reference `run.py:46-50`):
every network sees the FULL sample y [B, n_var] with its own variable's
input multiplied by zero, and reconstructs full width with its own position
masked out of the loss. This is mathematically identical to removing the
column — a zeroed input contributes nothing forward and receives zero
gradient, so the diagonal weight rows/columns are inert at their init — but
it is the shape TPUs want:
- no per-element gather (at n=1058 the gathered views cost more than the
  matmuls, and the [n, n-1] index table baked into the program as a
  multi-MB constant breaks/balloons compiles);
- the mask is generated from iota comparisons inside the kernel (no
  constants) and fuses into the matmul operand read;
- first/last layers become dense [n, n, u] stacks, which XLA tiles better.
Model-facing tensors are variable-major [n_or_f, B, n_var].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pgmvae_tpu.ops import initializers as pinit
from pgmvae_tpu.ops import quantizer as q


class VqVaeConfig(NamedTuple):
    n_var: int
    units: Tuple[int, ...]       # hidden widths (encoder order)
    dim: int                     # latent / embedding dimension D
    num_codes: int               # codebook size K
    cost: float = 0.25           # commitment cost beta
    decay: float = 0.99          # EMA decay gamma
    quantizer: str = 'ema'       # 'ema' | 'vq' | 'naive'
    zero_debias: bool = True     # TF assign_moving_average default
    epsilon: float = 1e-5        # EMA Laplace smoothing
    dead_code_threshold: float = 0.0  # >0: restart codes with EMA usage < t
    fan_mode: str = 'tf_stacked'
    dtype: str = 'float32'
    vq_impl: str = 'auto'   # 'auto' | 'xla' | 'pallas' | 'pallas_interpret'
    matmul_precision: str = 'default'  # jax.default_matmul_precision name
    activation: str = 'selu'     # hidden activation (ref hardcodes selu,
    #                              core/model.py:19-35; Keras FatDense lets
    #                              callers pick any, core/dense.py:46)
    l2_reg: float = 0.0          # L2 penalty on dense kernels (the hook for
    #                              FatDense's kernel_regularizer,
    #                              core/dense.py:50,63-64; ref drivers never
    #                              set one, so default off)
    n_active: Optional[int] = None  # true variable count when n_var is
    #                              padded up so the 'model' mesh axis divides
    #                              it (e.g. bbc 1058 -> 1064 on 8 devices).
    #                              Networks/columns >= n_active are inert:
    #                              zero input columns, zero loss mask rows,
    #                              sliced out of stage-2 counts.
    compute_dtype: str = 'f32'   # 'f32' | 'bf16': forward/backward compute
    #                              dtype. 'bf16' keeps MASTER params, Adam
    #                              moments, EMA statistics, loss reductions,
    #                              and all of stage 2 in f32, but casts
    #                              params + batch to bfloat16 for the fwd/bwd
    #                              pass — halving every activation, weight-
    #                              read and cotangent HBM stream (the
    #                              bandwidth bound at bbc scale, see
    #                              docs/design.md step anatomy). MXU
    #                              accumulates bf16 matmuls in f32 natively,
    #                              so matmul sums lose no precision; what
    #                              changes is activation rounding (and
    #                              possibly argmin code assignments), i.e. a
    #                              different training trajectory — opt-in,
    #                              identifier-recorded as cd-bf16.
    first_layer: str = 'masked'  # 'masked' | 'rank1' | 'auto': how the first
    #                              encoder layer applies leave-one-out. See
    #                              _first_layer_rank1 — identical math,
    #                              'rank1' skips the [n, B, n] masked-input
    #                              materialization. MEASURED (BENCH_r03,
    #                              confirmed r4 anatomy): masked is FASTER
    #                              at every benchmarked shape (bbc bs=250
    #                              +15%, ad bs=250 +8%) because XLA fuses
    #                              the iota-mask broadcast into the matmul
    #                              operand read, so the traffic rank1
    #                              targets largely never exists. rank1 is
    #                              the out-of-memory fallback: 'auto' keeps
    #                              masked unless the [n, B, n] buffer would
    #                              exceed FIRST_LAYER_RANK1_BYTES of HBM.

    @property
    def effective_codes(self) -> int:
        """Number of discrete codes stage 2 counts over."""
        return 2 ** self.dim if self.quantizer == 'naive' else self.num_codes

    @property
    def active_vars(self) -> int:
        """True (unpadded) variable count."""
        return self.n_active if self.n_active is not None else self.n_var


# Hidden-activation registry (the reference's FatDense accepts any Keras
# activation string, core/dense.py:46; these cover the practical surface).
ACTIVATIONS = {
    'selu': jax.nn.selu,
    'relu': jax.nn.relu,
    'gelu': jax.nn.gelu,
    'elu': jax.nn.elu,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'linear': lambda x: x,
}


def activation_fn(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f'unknown activation {name!r}; '
                         f'choose from {sorted(ACTIVATIONS)}') from None


def l2_penalty(params) -> jax.Array:
    """Sum of squared dense-kernel entries (biases and codebook excluded) —
    the regularizer hook of FatDense (ref core/dense.py:50). The inert
    diagonal rows of the first/last stacked kernels are included; they only
    decay toward their (already gradient-free) init, which is harmless."""
    return sum(jnp.sum(w * w)
               for stack in (params['enc'], params['dec'])
               for w, _ in stack)


class ForwardOut(NamedTuple):
    recon: jax.Array          # [n, B, n_var] sigmoid recon (diag masked)
    z: jax.Array              # [n, B, D] pre-quantization latents
    indices: jax.Array        # [n, B] code assignments
    e_loss: jax.Array         # commitment loss
    q_loss: jax.Array         # codebook loss (0 for ema/naive)


def _layer_dims(cfg: VqVaeConfig):
    # padded layout: first input and last output are full n_var wide; the
    # diagonal row/column of those stacked kernels is inert (see module doc)
    enc_in = (cfg.n_var,) + tuple(cfg.units)
    enc_out = tuple(cfg.units) + (cfg.dim,)
    dec_in = (cfg.dim,) + tuple(reversed(cfg.units))
    dec_out = tuple(reversed(cfg.units)) + (cfg.n_var,)
    return tuple(zip(enc_in, enc_out)), tuple(zip(dec_in, dec_out))


def loo_mask(n_var: int, var_ids: Optional[jax.Array] = None,
             dtype=jnp.float32,
             n_active: Optional[int] = None) -> jax.Array:
    """Leave-one-out mask [F, 1, n_var]: 0 at each selected network's own
    variable, 1 elsewhere. Built from iota comparison — no constants in the
    compiled program.

    With `n_active < n_var` (padded variable axis), columns >= n_active and
    whole rows for networks >= n_active are zeroed too, making the padding
    networks/columns exactly inert in any masked reduction."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_var), 2)
    if var_ids is None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_var, 1, 1), 0)
    else:
        rows = var_ids.astype(jnp.int32)[:, None, None]
    keep = col != rows
    if n_active is not None and n_active < n_var:
        keep = keep & (col < n_active) & (rows < n_active)
    return keep.astype(dtype)


def init_model(key: jax.Array, cfg: VqVaeConfig):
    """Build (params, codebook). params = {'enc': [(w,b)...], 'dec': [...]}.

    Inits mirror the reference: he_uniform for all selu layers
    (core/model.py:19-20), glorot_uniform for the sigmoid output
    (core/model.py:36), VarianceScaling-uniform codebook
    (core/quantizer.py:36), zero biases — all with the reference's stacked
    fan semantics (see ops/initializers.py).
    """
    dtype = jnp.dtype(cfg.dtype)
    enc_dims, dec_dims = _layer_dims(cfg)
    n_layers = len(enc_dims) + len(dec_dims)
    keys = jax.random.split(key, n_layers + 1)

    def dense(k, i, o, init_fn):
        w = init_fn(k, (cfg.n_var, i, o), fan_mode=cfg.fan_mode, dtype=dtype)
        b = jnp.zeros((cfg.n_var, 1, o), dtype)
        return (w, b)

    enc = [dense(keys[li], i, o, pinit.he_uniform)
           for li, (i, o) in enumerate(enc_dims)]
    dec = []
    for li, (i, o) in enumerate(dec_dims):
        is_last = li == len(dec_dims) - 1
        init_fn = pinit.glorot_uniform if is_last else pinit.he_uniform
        dec.append(dense(keys[len(enc_dims) + li], i, o, init_fn))
    params = {'enc': enc, 'dec': dec}

    if cfg.quantizer == 'naive':
        codebook = None
    else:
        codebook = pinit.variance_scaling_uniform(
            keys[-1], (cfg.n_var, cfg.dim, cfg.num_codes),
            scale=1.0, mode='fan_in', fan_mode=cfg.fan_mode, dtype=dtype)
    return params, codebook


def _dense_stack(layers, x, activation):
    """Apply a stack of batched dense layers: [n,B,i] x [n,i,o] + [n,1,o]."""
    for w, b in layers:
        x = activation(jnp.einsum('nbi,nio->nbo', x, w,
                                  preferred_element_type=x.dtype) + b)
    return x


# 'auto' switches the first layer to rank1 only when the masked design's
# [n, B, n] f32 buffer would exceed this HBM budget (v5e: 16 GB total;
# the buffer appears ~3x across fwd + bwd). Below it, masked is measured
# faster at every benchmarked shape (see VqVaeConfig.first_layer).
FIRST_LAYER_RANK1_BYTES = 4 << 30


@jax.custom_vjp
def _rank1_linear(w0, y):
    """sum_i y_i W[v,i,o] - y_v W[v,v,o]: the masked first layer's linear
    map without the [n, B, n] masked-input materialization."""
    base = jnp.einsum('bi,nio->nbo', y, w0, preferred_element_type=y.dtype)
    diag = jnp.einsum('nno->no', w0)             # W[v, v, :]
    return base - y.T[:, :, None] * diag[:, None, :]


def _rank1_linear_fwd(w0, y):
    return _rank1_linear(w0, y), (w0, y)


def _rank1_linear_bwd(res, g):
    w0, y = res
    # dL/dW[v,i,o] = sum_b y[b,i] g[v,b,o] for i != v, and EXACTLY zero on
    # the diagonal (the base and correction contributions cancel
    # analytically; computing them as separate reductions leaves a float
    # residual that Adam would amplify into diagonal drift, so the true
    # zero is imposed here — matching the masked path, whose zeroed input
    # column yields a bit-zero diagonal gradient).
    gw = jnp.einsum('bi,nbo->nio', y, g, preferred_element_type=g.dtype)
    n = gw.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1))
    gw = jnp.where(eye, jnp.zeros((), gw.dtype), gw)
    # dL/dy[b,i] = sum_{v,o} g[v,b,o] W[v,i,o] - sum_o g[i,b,o] W[i,i,o]
    diag = jnp.einsum('nno->no', w0)
    gy = jnp.einsum('nbo,nio->bi', g, w0, preferred_element_type=g.dtype)
    gy = gy - jnp.einsum('nbo,no->bn', g, diag,
                         preferred_element_type=g.dtype)
    return gw, gy


_rank1_linear.defvjp(_rank1_linear_fwd, _rank1_linear_bwd)


def _first_layer_rank1(w0, b0, y, act):
    """First encoder layer without materializing the [n, B, n] masked input.

    Leave-one-out masking only zeroes network v's OWN input column, so
      act(sum_i (y_i * mask_vi) W[v,i,o] + b) =
      act(sum_i  y_i           W[v,i,o] - y_v W[v,v,o] + b):
    one full-width matmul sharing y across all n networks, plus a rank-1
    diagonal correction. Same FLOPs, but the [n, B, n] broadcast-masked
    operand (and its [n, B, n] cotangent in the backward pass) never hits
    HBM — at bbc scale (n=1058, bs=250) that is ~4 GB/step of traffic.
    A custom VJP (_rank1_linear_bwd) pins the diagonal's gradient to its
    true analytic zero, preserving the inert-diagonal invariant."""
    return act(_rank1_linear(w0, y) + b0)


def encode(params, y: jax.Array,
           var_ids: Optional[jax.Array] = None,
           activation: str = 'selu',
           first_layer: str = 'masked') -> jax.Array:
    """Samples y [B, n_var] -> latents z [F, B, D] (selu encoder by default,
    ref core/model.py:42-46; any ACTIVATIONS entry via cfg.activation).
    Network f sees y with its own variable's input masked to zero (padded
    leave-one-out; see module doc). `var_ids` selects a subset of networks
    (the reference's `fts`); params must already be gathered to match (see
    gather_variables)."""
    w0 = params['enc'][0][0]
    n_var = w0.shape[1]
    act = activation_fn(activation)
    # rank1 requires the shared-sample layout (the per-network-state [F,B,n]
    # Gibbs case and explicit var_ids subsets keep the masked path)
    if var_ids is None and y.ndim == 2 and (
            first_layer == 'rank1'
            or (first_layer == 'auto'
                and 4 * n_var * y.shape[0] * n_var
                > FIRST_LAYER_RANK1_BYTES)):
        x = _first_layer_rank1(w0, params['enc'][0][1], y, act)
        return _dense_stack(params['enc'][1:], x, act)
    mask = loo_mask(n_var, var_ids, y.dtype)
    # y may be [B, n] (shared across networks) or [F, B, n] (one state per
    # selected network — the Gibbs chain case)
    x = (y[None, :, :] if y.ndim == 2 else y) * mask
    return _dense_stack(params['enc'], x, act)


def _decode(params, x: jax.Array, activation: str = 'selu') -> jax.Array:
    hidden, last = params['dec'][:-1], params['dec'][-1]
    x = _dense_stack(hidden, x, activation_fn(activation))
    w, b = last
    return jax.nn.sigmoid(jnp.einsum('nbi,nio->nbo', x, w,
                                     preferred_element_type=x.dtype) + b)


def apply_model(params, codebook, y: jax.Array, cfg: VqVaeConfig,
                weights: Optional[jax.Array] = None,
                var_ids: Optional[jax.Array] = None) -> ForwardOut:
    """Full forward pass (ref core/model.py:39-55): y [B, n_var] ->
    recon [F, B, n_var] (each network's own column is inert — mask it out of
    any loss with `loo_mask`).

    `weights` are optional per-sample weights on the batch axis (0/1 mask for
    ragged final batches) applied to every mean-reduction.
    """
    z = encode(params, y, var_ids, cfg.activation, cfg.first_layer)
    # with explicit var_ids the rows are selection positions, not variable
    # ids — the padding row-mask only applies to the full-stack layout
    na = (cfg.active_vars
          if var_ids is None and cfg.active_vars < cfg.n_var else None)
    if cfg.quantizer == 'naive':
        out = q.naive_forward(z, weights, n_active=na)
        latent, indices = out.output, q.naive_codes(z)
        e_loss, q_loss = out.e_loss, jnp.zeros((), z.dtype)
    else:
        vq = q.vq_forward(z, codebook, weights, impl=cfg.vq_impl,
                          n_active=na)
        latent, indices, e_loss, q_loss = vq
    recon = _decode(params, latent, cfg.activation)
    return ForwardOut(recon, z, indices, e_loss, q_loss)


def encode_codes(params, codebook, y: jax.Array, cfg: VqVaeConfig,
                 var_ids: Optional[jax.Array] = None) -> jax.Array:
    """Encoder + quantizer only -> code indices [F, B] (the reference's
    `code_only=True` path, ref core/model.py:48, quantizer.py:54-56)."""
    z = encode(params, y, var_ids, cfg.activation, cfg.first_layer)
    if cfg.quantizer == 'naive':
        return q.naive_codes(z)
    return q.vq_codes(z, codebook, impl=cfg.vq_impl)


def gather_variables(params, codebook, fts: jax.Array):
    """Select a subset of the independent networks by variable index (the
    reference's `fts` argument, ref core/dense.py:103-105,
    core/quantizer.py:43,134). Because every leaf is stacked on axis 0, this
    is a single gather per leaf."""
    sub_params = jax.tree.map(lambda p: jnp.take(p, fts, axis=0), params)
    sub_codebook = None if codebook is None else jnp.take(codebook, fts, axis=0)
    return sub_params, sub_codebook
