"""Single-pass fused Adam update.

The round-4 step anatomy (scripts/bench_step_anatomy.py) found the Adam
update dominating the big-model train step: at bbc scale (1.33 GB of f32
params) the optax `adam.update` + `apply_updates` phase adds ~33 ms/step
against ~8 ms of analytic HBM traffic — XLA schedules the moment updates,
bias correction, and parameter application as several HBM round-trips
instead of one. (The reference hits none of this: its optimizer is stock
Keras Adam over KB..MB models, reference `core/model.py:30-38`; at tpu
scale the optimizer update is the roofline term that matters.)

This module computes, per parameter leaf, in ONE pass over memory:

    mu'  = b1*mu + (1-b1)*g
    nu'  = b2*nu + (1-b2)*g^2
    p'   = p - lr * (mu'/(1-b1^t)) / (sqrt(nu'/(1-b2^t)) + eps)

which is bit-for-bit `optax.adam(lr, eps=eps)` + `optax.apply_updates`
(eps_root=0; same operation order — pinned by tests/test_fused_adam.py).

Two implementations:

- `xla`: the three updates in one traced expression per leaf, relying on
  XLA multi-output loop fusion (reads g,p,mu,nu; writes p',mu',nu').
- `pallas`: an explicit Pallas TPU kernel over a 2-D [n, i*o] view of each
  leaf, with `input_output_aliases` pinning the in-place update. Bench
  showed XLA already fuses the `xla` path to the same kernel shape, so
  `pallas` mainly serves as the guaranteed-fusion fallback; selection is
  measured, not assumed (scripts/bench_adam_probe.py).

State is the *same pytree structure* as
`optax.inject_hyperparams(optax.adam)(learning_rate, eps)` — init is
literally that transform's init — so checkpoints written by either
optimizer path load into the other (pgmvae_tpu/checkpoint.py stores the
state dict by structure).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class FusedAdam(NamedTuple):
    """`init(params) -> state` / `apply(grads, state, params) ->
    (new_params, new_state)`. Unlike optax's two-step update+apply, `apply`
    folds the parameter write into the same fused pass."""
    init: Any
    apply: Any


@functools.partial(jax.jit, inline=True)
def _bias_corr(decay: jax.Array, count: jax.Array) -> jax.Array:
    # optax's tree_bias_correction: `1 - decay**count`, f32 — and, like it,
    # jit-inlined: XLA's fused pow lowering differs from the eager op by
    # 1 ULP at some counts (measured: 1-0.999^3), so matching optax
    # bit-for-bit requires matching its jit boundary too.
    return 1.0 - jnp.asarray(decay, jnp.float32) ** count


def _leaf_update_xla(p, mu, nu, g, b1, b2, eps, bc1, bc2, lr):
    # b1/b2 must be f32 arrays and (1-b1) computed in f32 — optax's
    # inject_hyperparams casts them to f32 before `1 - decay`, and a
    # python-double 1-0.9 rounds to a DIFFERENT f32 (bit-parity pin).
    mu2 = b1 * mu + (1.0 - b1) * g
    nu2 = b2 * nu + (1.0 - b2) * jnp.square(g)
    mu_hat = mu2 / bc1
    nu_hat = nu2 / bc2
    u = mu_hat / (jnp.sqrt(nu_hat) + eps)
    return p + (-lr * u), mu2, nu2


# ------------------------------------------------------------- pallas -----

def _adam_kernel(sc_ref, p_ref, m_ref, v_ref, g_ref,
                 po_ref, mo_ref, vo_ref, *, b1: float, b2: float,
                 eps: float):
    bc1 = sc_ref[0, 0]
    bc2 = sc_ref[0, 1]
    lr = sc_ref[0, 2]
    b1f = jnp.float32(b1)
    b2f = jnp.float32(b2)
    one = jnp.float32(1.0)
    g = g_ref[...]
    m = b1f * m_ref[...] + (one - b1f) * g
    v = b2f * v_ref[...] + (one - b2f) * (g * g)
    mo_ref[...] = m
    vo_ref[...] = v
    u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    po_ref[...] = p_ref[...] + (-lr * u)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=('b1', 'b2', 'eps', 'interpret'))
def _leaf_update_pallas(p, mu, nu, g, scalars, *, b1, b2, eps,
                        interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = p.shape
    lead = shape[0] if len(shape) > 1 else 1
    rest = int(np_prod(shape) // lead)
    p2, m2, v2, g2 = (x.reshape(lead, rest) for x in (p, mu, nu, g))
    bn = min(8, _round_up(lead, 1))
    bc = min(2048, _round_up(rest, 128))
    grid = (pl.cdiv(lead, bn), pl.cdiv(rest, bc))
    spec = pl.BlockSpec((bn, bc), lambda i, j: (i, j))
    out = pl.pallas_call(
        functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((lead, rest), p.dtype)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(scalars, p2, m2, v2, g2)
    return tuple(x.reshape(shape) for x in out)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


# -------------------------------------------------------------- public ----

def fused_adam(learning_rate: float, eps: float = 1e-7, b1: float = 0.9,
               b2: float = 0.999, impl: str = 'xla',
               interpret: bool = False) -> FusedAdam:
    """Drop-in fused replacement for the Trainer's
    `inject_hyperparams(optax.adam)` path (same state pytree, same math).

    impl: 'xla' (fused expression, default), 'pallas' (explicit kernel),
    or 'xla_bf16' (moments stored bfloat16: halves the m,v HBM traffic —
    the update still computes in f32 from the rounded moments; a further
    ~0.4% relative moment-rounding drift on top of the fusion ULPs, so
    strictly an opt-in recorded as ad-fused_bf16).
    """
    ref = optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate, eps=eps, b1=b1, b2=b2)
    mdt = jnp.bfloat16 if impl == 'xla_bf16' else None

    def init(params):
        state = ref.init(params)
        if mdt is None:
            return state
        inner_adam, inner_rest = state.inner_state
        cast = functools.partial(jax.tree.map, lambda x: x.astype(mdt))
        new_inner = inner_adam._replace(mu=cast(inner_adam.mu),
                                        nu=cast(inner_adam.nu))
        return state._replace(inner_state=(new_inner, inner_rest))

    def apply(grads, state, params) -> Tuple[Any, Any]:
        hp = state.hyperparams
        lr = jnp.asarray(hp['learning_rate'], jnp.float32)
        b1v = jnp.asarray(hp.get('b1', b1), jnp.float32)
        b2v = jnp.asarray(hp.get('b2', b2), jnp.float32)
        inner_adam, inner_rest = state.inner_state
        count = optax.safe_int32_increment(inner_adam.count)
        bc1 = _bias_corr(b1v, count)
        bc2 = _bias_corr(b2v, count)

        leaves_p, treedef = jax.tree_util.tree_flatten(params)
        leaves_m = treedef.flatten_up_to(inner_adam.mu)
        leaves_v = treedef.flatten_up_to(inner_adam.nu)
        leaves_g = treedef.flatten_up_to(grads)

        if impl == 'pallas':
            scalars = jnp.stack([bc1, bc2, lr]).astype(
                jnp.float32).reshape(1, 3)
            new = [_leaf_update_pallas(p, m, v, g, scalars, b1=float(b1),
                                       b2=float(b2), eps=float(eps),
                                       interpret=interpret)
                   for p, m, v, g in zip(leaves_p, leaves_m, leaves_v,
                                         leaves_g)]
        elif mdt is not None:
            def upd16(p, m, v, g):
                p2, m2, v2 = _leaf_update_xla(
                    p, m.astype(jnp.float32), v.astype(jnp.float32), g,
                    b1v, b2v, jnp.asarray(eps, p.dtype), bc1, bc2, lr)
                return p2, m2.astype(mdt), v2.astype(mdt)
            new = [upd16(p, m, v, g)
                   for p, m, v, g in zip(leaves_p, leaves_m, leaves_v,
                                         leaves_g)]
        else:
            new = [_leaf_update_xla(p, m, v, g, b1v, b2v,
                                    jnp.asarray(eps, p.dtype), bc1, bc2, lr)
                   for p, m, v, g in zip(leaves_p, leaves_m, leaves_v,
                                         leaves_g)]
        unflat = [treedef.unflatten([t[i] for t in new]) for i in range(3)]
        new_params, new_mu, new_nu = unflat
        new_inner = inner_adam._replace(count=count, mu=new_mu, nu=new_nu)
        new_state = state._replace(inner_state=(new_inner, inner_rest))
        return new_params, new_state

    return FusedAdam(init=init, apply=apply)
