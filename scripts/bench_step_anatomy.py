#!/usr/bin/env python
"""Step-time anatomy at bbc scale (VERDICT r3 #4/#6): attribute the train
step's wall to its components, and compute the HBM roofline.

The round-3 bench showed bbc bs=250 at 7.3% MFU with no evidence of where
the other ~93% goes. This measures, at the SAME shapes the bench uses:

  fwd        forward loss only (no grad, no update)
  grad       value_and_grad only (no Adam, no EMA)
  +adam      grad + optimizer update
  +ema       full train step minus metrics
  full       the real per-step path (train_step)
  epoch      the production epoch program (adds permutation + take + scan)

Each phase is timed as a jitted scan of STEPS identical steps (so dispatch
overhead amortizes exactly like production). Also prints the analytic HBM
roofline: bytes moved per step (params/grads/Adam/activations) over the
v5e's ~819 GB/s, vs the measured step time.

Usage: python scripts/bench_step_anatomy.py [--dataset bbc] [--batch 250]
       [--first-layer masked|rank1] [--steps 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819e9      # v5e HBM bandwidth
PEAK_FLOPS = 197e12   # v5e bf16 peak


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset', default='bbc')
    ap.add_argument('--batch', type=int, default=250)
    ap.add_argument('--dim', type=int, default=20)
    ap.add_argument('--codes', type=int, default=50)
    ap.add_argument('--first-layer', default='masked')
    ap.add_argument('--adam-impl', default='optax',
                    choices=['optax', 'fused', 'pallas', 'fused_bf16'])
    ap.add_argument('--compute-dtype', default='f32',
                    choices=['f32', 'bf16'])
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (the axon plugin overrides '
                         'JAX_PLATFORMS=cpu; this uses jax.config instead)')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.models import vqvae
    from pgmvae_tpu.ops import quantizer as q
    from pgmvae_tpu.registry import REGISTRY
    from pgmvae_tpu.train import Trainer
    from pgmvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    info = REGISTRY[args.dataset]
    y = np.asarray(load_split(args.dataset, 'train'), np.float32)
    cfg = VqVaeConfig(n_var=info.n_var, units=info.encoder_units(args.dim),
                      dim=args.dim, num_codes=args.codes, cost=0.05,
                      decay=0.9, quantizer='ema', dead_code_threshold=0.25,
                      fan_mode='per_network', first_layer=args.first_layer,
                      compute_dtype=args.compute_dtype)
    B = args.batch
    trainer = Trainer(cfg, 3e-3, B, len(y), adam_impl=args.adam_impl)
    state = trainer.init_state(jax.random.PRNGKey(1))
    yb = jnp.asarray(y[:B])
    w = jnp.ones((B,), jnp.float32)
    # mirror the trainer's compute-dtype cast (train.py _train_step_impl) so
    # fwd/grad phases measure the same half-width streams the full step uses
    cdt = jnp.bfloat16 if args.compute_dtype == 'bf16' else None

    def fwd_loss(params, ema, yb, w):
        p = params if cdt is None else jax.tree.map(
            lambda l: l.astype(cdt), params)
        cb = ema.codebook if cdt is None else ema.codebook.astype(cdt)
        ybc = yb if cdt is None else yb.astype(cdt)
        m = vqvae.loo_mask(cfg.n_var, None, yb.dtype, n_active=cfg.active_vars)
        out = vqvae.apply_model(p, cb, ybc, cfg, weights=w.astype(ybc.dtype))
        mse = jnp.sum((out.recon - ybc[None]) ** 2 * m * w[None, :, None]) / (
            cfg.n_var * (cfg.n_var - 1) * jnp.maximum(jnp.sum(w), 1.0))
        return mse + cfg.cost * out.e_loss, out

    def phase_fwd(state, yb, w, key):
        loss, _ = fwd_loss(state.params, state.ema, yb, w)
        return state, loss

    def phase_grad(state, yb, w, key):
        (loss, _), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(state.params, state.ema, yb, w)
        # fold a REAL reduction of every grad leaf into the carried loss —
        # multiplying by 0.0 lets XLA dead-code the whole backward pass
        # (the first run of this script reported a fake 2.6 ms 'grad')
        return state, loss + 1e-30 * sum(jnp.sum(g)
                                         for g in jax.tree.leaves(grads))

    def apply_adam(grads, opt_state, params):
        if args.adam_impl == 'optax':
            updates, opt_state = trainer.optimizer.update(
                grads, opt_state, params)
            return jax.tree.map(lambda p, u: p + u, params, updates), opt_state
        return trainer._fused_adam.apply(grads, opt_state, params)

    def phase_adam(state, yb, w, key):
        (loss, _), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(state.params, state.ema, yb, w)
        params, opt_state = apply_adam(grads, state.opt_state, state.params)
        return state._replace(params=params, opt_state=opt_state), loss

    def phase_ema(state, yb, w, key):
        (loss, out), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(state.params, state.ema, yb, w)
        params, opt_state = apply_adam(grads, state.opt_state, state.params)
        z32 = out.z if cdt is None else out.z.astype(jnp.float32)
        counts, dw = q.code_stats(z32, out.indices, cfg.num_codes, weights=w)
        ema = q.ema_update(state.ema, counts, dw, cfg.decay, cfg.epsilon, True)
        ema = q.restart_dead_codes(ema, z32, key, cfg.dead_code_threshold,
                                   cfg.decay, True, weights=w)
        return state._replace(params=params, opt_state=opt_state, ema=ema), loss

    def phase_full(state, yb, w, key):
        state, m = trainer.train_step(state, yb, w, key=key)
        return state, m.loss

    def timed(name, fn, state):
        # ONE live state copy throughout: the runner donates its input and
        # the trajectory simply continues across reps (timing is invariant
        # to the state's values) — at bbc scale the state is ~3.8 GB, so
        # holding a template + working copy OOMs the chip
        @functools.partial(jax.jit, donate_argnums=(0,))
        def runner(state, yb, w, key):
            def body(st, i):
                return fn(st, yb, w, jax.random.fold_in(key, i))
            return jax.lax.scan(body, state, jnp.arange(args.steps))

        state, ls = runner(state, yb, w, jax.random.PRNGKey(0))  # compile
        jax.device_get(ls)
        best = float('inf')
        for r in range(args.reps):
            t0 = time.time()
            state, ls = runner(state, yb, w, jax.random.PRNGKey(r))
            jax.device_get(ls)
            best = min(best, (time.time() - t0) / args.steps)
        print(f'{name:8s} {best * 1e3:8.2f} ms/step', flush=True)
        return state, best

    results = {}
    state, results['fwd'] = timed('fwd', phase_fwd, state)
    state, results['grad'] = timed('grad', phase_grad, state)
    state, results['adam'] = timed('+adam', phase_adam, state)
    state, results['ema'] = timed('+ema', phase_ema, state)
    state, results['full'] = timed('full', phase_full, state)

    # production epoch program, per-step
    data = jnp.asarray(y)
    state, m = trainer.run_epochs(state, data, jax.random.PRNGKey(0), 0, 4)
    jax.device_get(m)
    t0 = time.time()
    state, m = trainer.run_epochs(state, data, jax.random.PRNGKey(1), 0, 4)
    jax.device_get(m)
    per_step = (time.time() - t0) / (4 * trainer.steps_per_epoch)
    results['epoch'] = per_step
    print(f'{"epoch":8s} {per_step * 1e3:8.2f} ms/step '
          f'({4 * trainer.steps_per_epoch} steps incl ragged)', flush=True)

    # ---- analytic roofline ------------------------------------------------
    n = cfg.n_var
    pbytes = sum(l.size * 4 for l in jax.tree.leaves(state.params))
    act_first = n * B * n * 4            # masked input [n,B,n] (if present)
    act_recon = n * B * n * 4            # recon [n,B,n]
    mm = sum(a * b for a, b in zip((n,) + tuple(cfg.units),
                                   tuple(cfg.units) + (cfg.dim,)))
    flops = B * 3 * 2 * n * (2 * mm + cfg.dim * cfg.num_codes)
    # half-width factors: compute streams halve under cd-bf16 (grads stay
    # f32 — the astype VJP materializes f32 leaves); Adam moment traffic
    # halves under ad-fused_bf16
    cf = 0.5 if args.compute_dtype == 'bf16' else 1.0
    mf = 0.5 if args.adam_impl == 'fused_bf16' else 1.0
    traffic = {
        'params fwd read': pbytes * cf,
        'params bwd read': pbytes * cf,
        'grads write+read': 2 * pbytes,
        'adam m,v read+write + params write': pbytes * (4 * mf + 1),
        'masked-x fwd+bwd (first layer)': 3 * act_first * cf,
        'recon + cotangent': 3 * act_recon * cf,
    }
    tot = sum(traffic.values())
    print('\nroofline (analytic):', file=sys.stderr)
    for k, v in traffic.items():
        print(f'  {k:38s} {v / 1e9:7.2f} GB '
              f'({v / HBM_GBPS * 1e3:6.2f} ms)', file=sys.stderr)
    print(f'  {"TOTAL":38s} {tot / 1e9:7.2f} GB '
          f'({tot / HBM_GBPS * 1e3:6.2f} ms roofline) vs measured '
          f'{results["full"] * 1e3:.2f} ms '
          f'-> {tot / HBM_GBPS / results["full"] * 100:.0f}% of HBM roofline; '
          f'compute {flops / 1e9:.0f} GFLOP/step '
          f'({flops / PEAK_FLOPS * 1e3:.2f} ms at peak, '
          f'MFU {flops / results["full"] / PEAK_FLOPS * 100:.1f}%)',
          file=sys.stderr)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
