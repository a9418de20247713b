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
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    import jax
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
                      fan_mode='per_network', first_layer=args.first_layer)
    B = args.batch
    trainer = Trainer(cfg, 3e-3, B, len(y))
    state = trainer.init_state(jax.random.PRNGKey(1))
    yb = jnp.asarray(y[:B])
    w = jnp.ones((B,), jnp.float32)

    def fwd_loss(params, ema, yb, w):
        m = vqvae.loo_mask(cfg.n_var, None, yb.dtype, n_active=cfg.active_vars)
        out = vqvae.apply_model(params, ema.codebook, yb, cfg, weights=w)
        mse = jnp.sum((out.recon - yb[None]) ** 2 * m * w[None, :, None]) / (
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

    def phase_adam(state, yb, w, key):
        (loss, _), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(state.params, state.ema, yb, w)
        updates, opt_state = trainer.optimizer.update(
            grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state._replace(params=params, opt_state=opt_state), loss

    def phase_ema(state, yb, w, key):
        (loss, out), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(state.params, state.ema, yb, w)
        updates, opt_state = trainer.optimizer.update(
            grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        counts, dw = q.code_stats(out.z, out.indices, cfg.num_codes, weights=w)
        ema = q.ema_update(state.ema, counts, dw, cfg.decay, cfg.epsilon, True)
        ema = q.restart_dead_codes(ema, out.z, key, cfg.dead_code_threshold,
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
    traffic = {
        'params fwd read': pbytes,
        'params bwd read': pbytes,
        'grads write+read': 2 * pbytes,
        'adam m,v read+write + params write': 5 * pbytes,
        'masked-x fwd+bwd (first layer)': 3 * act_first,
        'recon + cotangent': 3 * act_recon,
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
