#!/usr/bin/env python
"""Out-of-core streaming fit, exercised for real (VERDICT r2, next-round #7).

Builds a synthetic binary dataset genuinely larger than the 4 GiB
`stream_bytes` threshold (the reference's run.py:53 TODO: "design data
pipeline for large dataset ... less than 4G"), trains one epoch through the
host-chunked streaming engine on the real chip, and records throughput next
to the in-core rate of the same model on a device-resident subset.

Appends a JSON record to logs/bench_streaming.jsonl.
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
    ap.add_argument('--vars', type=int, default=64)
    ap.add_argument('--gib', type=float, default=4.5,
                    help='dataset size in GiB (f32), > the 4 GiB threshold')
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--k', type=int, default=64)
    ap.add_argument('--dim', type=int, default=10)
    ap.add_argument('--out', default='logs/bench_streaming.jsonl')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.registry import default_units
    from pgmvae_tpu.train import Trainer
    from pgmvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rows = int(args.gib * (1 << 30) / (args.vars * 4))
    print(f'generating {rows:,} x {args.vars} f32 samples '
          f'({rows * args.vars * 4 / 2**30:.2f} GiB host)...', flush=True)
    rng = np.random.default_rng(0)
    data = np.empty((rows, args.vars), np.float32)
    step = 1 << 20
    for s in range(0, rows, step):      # chunked fill keeps peak RAM flat
        e = min(s + step, rows)
        data[s:e] = rng.integers(0, 2, size=(e - s, args.vars))

    cfg = VqVaeConfig(n_var=args.vars, units=default_units(args.vars, args.dim),
                      dim=args.dim, num_codes=args.k, quantizer='ema')
    tr = Trainer(cfg, 0.001, args.batch, rows)
    assert data.nbytes > tr.stream_bytes, 'dataset must exceed stream_bytes'
    st = tr.init_state(jax.random.PRNGKey(0))

    # in-core comparator: the same model/batch on a device-resident subset
    sub = data[:1 << 20]
    tr_sub = Trainer(cfg, 0.001, args.batch, len(sub))
    st_sub = tr_sub.init_state(jax.random.PRNGKey(0))
    dsub = jnp.asarray(sub)
    st_sub, m = tr_sub.run_epochs(st_sub, dsub, jax.random.PRNGKey(1), 0, 1)
    jax.device_get(m)                   # warm compile
    t0 = time.time()
    st_sub, m = tr_sub.run_epochs(st_sub, dsub, jax.random.PRNGKey(2), 0, 1)
    jax.device_get(m)
    incore_sps = len(sub) / (time.time() - t0)
    del st_sub, dsub

    t0 = time.time()
    st, hist = tr.fit(st, data, epochs=1, key=jax.random.PRNGKey(1))
    jax.block_until_ready(st.params)
    wall = time.time() - t0
    stream_sps = rows / wall

    rec = {
        'rows': rows, 'vars': args.vars,
        'gib': round(data.nbytes / 2**30, 2),
        'batch': args.batch,
        'stream_epoch_wall': round(wall, 1),
        'stream_sps': round(stream_sps, 1),
        'incore_sps_subset': round(incore_sps, 1),
        'stream_vs_incore': round(stream_sps / incore_sps, 3),
        'loss': float(hist[-1].loss),
        'device': str(jax.devices()[0]),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'a') as f:
        f.write(json.dumps(rec) + '\n')
    print(json.dumps(rec))
    return 0


if __name__ == '__main__':
    sys.exit(main())
