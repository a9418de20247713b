#!/usr/bin/env python
"""Packed-seed throughput benchmark (VERDICT r2, next-round #3).

A seed sweep is the same compiled program with a different PRNG key; packing
S seeds vmaps their training states into ONE device program. This measures
steady-state drained throughput of S serial cells vs one packed run on the
same config (netflix tuned shape by default) and prints a JSON record.

Per-seed numerical identity is pinned separately by tests/test_packed.py;
this script is about wall-clock only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('-n', '--name', default='netflix')
    ap.add_argument('-k', '--embedding', type=int, default=500)
    ap.add_argument('-d', '--dim', type=int, default=10)
    ap.add_argument('-b', '--batch', type=int, default=128)
    ap.add_argument('-e', '--epochs', type=int, default=32)
    ap.add_argument('-s', '--seeds', type=int, default=5)
    ap.add_argument('--out', default='logs/bench_packed.jsonl')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pgmvae_tpu import REGISTRY
    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.train import Trainer
    from pgmvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    info = REGISTRY[args.name]
    y = load_split(args.name, 'train')
    cfg = VqVaeConfig(n_var=info.n_var, units=info.encoder_units(args.dim),
                      dim=args.dim, num_codes=args.embedding, quantizer='ema')
    trainer = Trainer(cfg, 0.001, args.batch, len(y))
    data = jnp.asarray(y, jnp.float32)
    keys = jnp.stack([jax.random.PRNGKey(s) for s in range(1, args.seeds + 1)])

    # serial: S cells one after another (same program, warm cache after the
    # first), steady state timed after a warmup block
    st = trainer.init_state(jax.random.PRNGKey(1))
    st, m = trainer.run_epochs(st, data, jax.random.PRNGKey(1), 0,
                               args.epochs)
    jax.device_get(m)                   # warm compile + drain
    t0 = time.time()
    for s in range(args.seeds):
        st = trainer.init_state(keys[s])
        st, m = trainer.run_epochs(st, data, keys[s], 0, args.epochs)
        jax.device_get(m)
    serial_wall = time.time() - t0
    serial_sps = args.seeds * args.epochs * len(y) / serial_wall

    # packed: one vmapped program carrying all S states
    sts = trainer.init_states_packed(keys)
    sts, m = trainer.run_epochs_packed(sts, data, keys, 0, args.epochs)
    jax.device_get(m)                   # warm
    sts = trainer.init_states_packed(keys)
    t0 = time.time()
    sts, m = trainer.run_epochs_packed(sts, data, keys, 0, args.epochs)
    jax.device_get(m)
    packed_wall = time.time() - t0
    packed_sps = args.seeds * args.epochs * len(y) / packed_wall

    rec = {
        'config': f'{args.name} K={args.embedding} D={args.dim} '
                  f'bs={args.batch} e={args.epochs} ema',
        'seeds': args.seeds,
        'serial_wall': round(serial_wall, 3),
        'packed_wall': round(packed_wall, 3),
        'serial_agg_sps': round(serial_sps, 1),
        'packed_agg_sps': round(packed_sps, 1),
        'speedup': round(packed_sps / serial_sps, 2),
        'device': str(jax.devices()[0]),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec))
    return 0


if __name__ == '__main__':
    sys.exit(main())
