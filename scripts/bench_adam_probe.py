#!/usr/bin/env python
"""Isolate the optimizer-update cost found by bench_step_anatomy (the +adam
phase adds ~33 ms/step at bbc bs=250 against ~8 ms of analytic HBM traffic).

Times, at the exact bbc parameter shapes, a scan of N iterations of:
  carry     params += 1e-6                      (carry-copy control: 2 reads
                                                 + 1 write of params)
  optax     optax.adam (inject_hyperparams, the production optimizer)
  optax-raw optax.adam without inject_hyperparams
  manual    hand-fused Adam (same math: b1=.9 b2=.999 eps=1e-7, bias corr)

Grads are a constant broadcast inside the loop (no backward pass), so any
time above the carry control is pure optimizer-update cost.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--small', action='store_true',
                    help='tiny shapes (CPU smoke test)')
    ap.add_argument('--cpu', action='store_true',
                    help='force the CPU backend (the axon plugin overrides '
                         'JAX_PLATFORMS=cpu; this uses jax.config instead)')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax

    from pgmvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # bbc-scale parameter stack: [1058,1058,111] + 3x[1058,111,111] + ...
    n, u, d = (32, 16, 4) if args.small else (1058, 111, 20)
    shapes = ([(n, n, u)] + [(n, u, u)] * 3 + [(n, u, d)]
              + [(n, d, u)] + [(n, u, u)] * 3 + [(n, u, n)])
    key = jax.random.PRNGKey(0)
    params = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32)
              * 1e-2 for i, s in enumerate(shapes)]
    grads = [jax.random.normal(jax.random.fold_in(key, 100 + i), s,
                               jnp.float32) * 1e-3
             for i, s in enumerate(shapes)]
    gb = sum(p.size * 4 for p in params) / 1e9
    print(f'param bytes: {gb:.2f} GB', flush=True)

    def timed(name, carry, runner):
        runner = jax.jit(runner, donate_argnums=(0,))
        carry, out = runner(carry, grads)
        jax.device_get(out)
        best = float('inf')
        for _ in range(args.reps):
            t0 = time.time()
            carry, out = runner(carry, grads)
            jax.device_get(out)
            best = min(best, (time.time() - t0) / args.steps)
        print(f'{name:10s} {best * 1e3:8.2f} ms/step '
              f'(~{3 * gb / best:0.0f} GB/s if 3x param traffic)', flush=True)
        del carry
        return best

    results = {}

    def run_carry(params, grads):
        def body(p, _):
            return [x + 1e-6 for x in p], jnp.zeros(())
        p, o = jax.lax.scan(body, params, jnp.arange(args.steps))
        return p, o[-1]

    results['carry'] = timed('carry', [jnp.copy(p) for p in params],
                             run_carry)

    def make_optax(inject):
        tx = optax.adam(learning_rate=3e-3, eps=1e-7)
        if inject:
            tx = optax.inject_hyperparams(optax.adam)(learning_rate=3e-3,
                                                      eps=1e-7)

        def run(carry, grads):
            p, s = carry
            def body(c, _):
                p, s = c
                u, s = tx.update(grads, s, p)
                return (optax.apply_updates(p, u), s), jnp.zeros(())
            (p, s), o = jax.lax.scan(body, (p, s), jnp.arange(args.steps))
            return (p, s), o[-1]
        return run, tx

    run_inj, tx_inj = make_optax(True)
    results['optax_inject'] = timed(
        'optax-inj', ([jnp.copy(p) for p in params],
                      tx_inj.init([jnp.copy(p) for p in params])), run_inj)

    run_raw, tx_raw = make_optax(False)
    results['optax_raw'] = timed(
        'optax-raw', ([jnp.copy(p) for p in params],
                      tx_raw.init([jnp.copy(p) for p in params])), run_raw)

    b1, b2, eps, lr = 0.9, 0.999, 1e-7, 3e-3

    def run_manual(carry, grads):
        def body(c, t):
            p, mu, nu, count = c
            count = count + 1
            bc1 = 1 - b1 ** count.astype(jnp.float32)
            bc2 = 1 - b2 ** count.astype(jnp.float32)
            mu = [b1 * m + (1 - b1) * g for m, g in zip(mu, grads)]
            nu = [b2 * v + (1 - b2) * (g * g) for v, g in zip(nu, grads)]
            p = [x - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                 for x, m, v in zip(p, mu, nu)]
            return (p, mu, nu, count), jnp.zeros(())
        c, o = jax.lax.scan(body, carry, jnp.arange(args.steps))
        return c, o[-1]

    results['manual'] = timed(
        'manual', ([jnp.copy(p) for p in params],
                   [jnp.zeros_like(p) for p in params],
                   [jnp.zeros_like(p) for p in params],
                   jnp.zeros((), jnp.int32)), run_manual)

    # the production fused path (ops/fused_adam.py) — what --adam-impl
    # fused/pallas actually runs, including state-structure overhead
    from pgmvae_tpu.ops.fused_adam import fused_adam
    for impl in ('xla', 'pallas', 'xla_bf16'):
        fa = fused_adam(3e-3, eps=1e-7, impl=impl,
                        interpret=args.cpu)

        def run_fa(carry, grads, fa=fa):
            def body(c, _):
                p2, s2 = fa.apply(grads, c[1], c[0])
                return (p2, s2), jnp.zeros(())
            c, o = jax.lax.scan(body, carry, jnp.arange(args.steps))
            return c, o[-1]

        results[f'fused_{impl}'] = timed(
            f'fused-{impl}', ([jnp.copy(p) for p in params],
                              fa.init([jnp.copy(p) for p in params])),
            run_fa)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
