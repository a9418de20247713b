#!/usr/bin/env python
"""Pallas fused VQ-argmin vs plain-XLA benchmark on the real TPU chip
(VERDICT round 1, weak #5 / next-round #5).

Sweeps (n_var, B, K) over the reference's operating envelope — n_var 16
(nltcs) to 1058 (bbc), K up to 4096 (the reference's active sweep grid,
`batch-job.sh:46`) — timing `ops.quantizer.vq_codes` impl='xla' vs
impl='pallas' (ops/pallas_vq.py) doing the identical argmin.

Timing is honest under the remote-dispatch backend: each measured repeat
ends in `jax.device_get` of the [n, B] int32 index output (i.e. full device
drain, not enqueue). The transfer being timed is identical for both impls,
so the *difference* is pure kernel time; we also report it.

Appends JSON lines to logs/pallas_vq_bench.jsonl and prints a markdown
table for docs/design.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pgmvae_tpu.ops.quantizer import vq_codes

# (n_var, B, K) grid: n spans nltcs..bbc, B the sweep batch sizes, K the
# recorded grids (50..70) through the reference's K=4096 kdd sweep.
NS = (16, 100, 163, 1058)
BS = (128, 1024)
KS = (50, 512, 4096)
D = 16


def _bytes_distances(n, b, k):
    return 4.0 * n * b * k


def bench_one(n, b, k, impl, reps=20, warmup=3):
    """Per-call kernel time via an in-device serial chain of `reps` calls
    (each iteration's input depends on the previous output, so XLA cannot
    hoist or CSE the body), timed around a single device_get — the remote-
    dispatch RTT (~35 ms on this tunnel) amortizes to noise."""
    key = jax.random.PRNGKey(0)
    kz, kw = jax.random.split(key)
    z = jax.random.normal(kz, (n, b, D), jnp.float32)
    w = jax.random.normal(kw, (n, D, k), jnp.float32)
    z, w = jax.device_put(z), jax.device_put(w)
    jax.block_until_ready((z, w))

    single = jax.jit(lambda z, w: vq_codes(z, w, impl=impl))

    @jax.jit
    def chain(z, w):
        def body(zc, _):
            idx = vq_codes(zc, w, impl=impl)
            # feed a scalar function of the output back in: serial chain
            zc = zc + (jnp.float32(1e-12)
                       * jnp.sum(idx).astype(jnp.float32))
            return zc, None
        zf, _ = jax.lax.scan(body, z, None, length=reps)
        return vq_codes(zf, w, impl=impl)

    idx = jax.device_get(single(z, w))          # correctness sample
    for _ in range(warmup):
        jax.device_get(chain(z, w))
    t0 = time.time()
    out = jax.device_get(chain(z, w))
    dt = (time.time() - t0) / (reps + 1)
    del out
    return dt, np.asarray(idx)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--out', default='logs/pallas_vq_bench.jsonl')
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f'device: {dev.platform} {dev.device_kind}', file=sys.stderr)
    rows = []
    for n in NS:
        for b in BS:
            for k in KS:
                if _bytes_distances(n, b, k) > 8e9:
                    note = 'skipped: XLA [n,B,K] distance tensor > 8 GB'
                    rows.append({'n': n, 'B': b, 'K': k, 'note': note})
                    print(f'n={n} B={b} K={k}: {note}', file=sys.stderr)
                    continue
                try:
                    t_xla, idx_x = bench_one(n, b, k, 'xla', args.reps)
                except Exception as e:  # noqa: BLE001 — record, keep going
                    rows.append({'n': n, 'B': b, 'K': k,
                                 'note': f'xla failed: {type(e).__name__}'})
                    continue
                try:
                    t_pal, idx_p = bench_one(n, b, k, 'pallas', args.reps)
                except Exception as e:  # noqa: BLE001
                    rows.append({'n': n, 'B': b, 'K': k,
                                 'xla_ms': round(t_xla * 1e3, 3),
                                 'note': f'pallas failed: {type(e).__name__}: {e}'[:300]})
                    continue
                mismatch = int(np.sum(idx_x != idx_p))
                row = {'n': n, 'B': b, 'K': k, 'D': D,
                       'xla_ms': round(t_xla * 1e3, 3),
                       'pallas_ms': round(t_pal * 1e3, 3),
                       'speedup': round(t_xla / t_pal, 3),
                       'indices_match': mismatch == 0,
                       'mismatch_count': mismatch,
                       'total': int(idx_x.size),
                       'device': f'{dev.platform}:{dev.device_kind}'}
                rows.append(row)
                print(json.dumps(row), file=sys.stderr, flush=True)

    with open(args.out, 'a') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')

    # markdown table for docs/design.md
    print('| n_var | B | K | XLA ms | Pallas ms | speedup | match |')
    print('|---|---|---|---|---|---|---|')
    for r in rows:
        if 'speedup' in r:
            print(f"| {r['n']} | {r['B']} | {r['K']} | {r['xla_ms']} | "
                  f"{r['pallas_ms']} | {r['speedup']}x | "
                  f"{'yes' if r['indices_match'] else 'NO'} |")
        else:
            print(f"| {r['n']} | {r['B']} | {r['K']} | — | — | — | "
                  f"{r.get('note', '')} |")
    return 0


if __name__ == '__main__':
    sys.exit(main())
