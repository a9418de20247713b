#!/usr/bin/env python
"""Reproduction-gap ablation (VERDICT round 1, weak #1 / next-round #1).

Re-runs the worst repro cells at the reference's recorded best
hyperparameters (data/trw/SUMMARY.txt) post-redesign, ablating the knobs
the verdict flagged as candidate causes:

  v0  default       (bf16-accumulating 'default' matmul precision)
  v1  highest       (f32 matmul precision everywhere)
  v2  highest+pn    (f32 precision + per_network init fan semantics)

Companion evidence: logs/ref_rerun.jsonl (scripts/reproduce_reference_tf.py)
holds the ACTUAL reference rerun under TF 2.21 at the same hypers — if that
also misses the recorded numbers, the records themselves are stale.

Appends JSON lines to logs/ablate_repro.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgmvae_tpu.driver import ExperimentConfig, run_experiment  # noqa: E402

# dataset: (K, D, epochs, batch, lr, cost, seed, recorded_best)
CELLS = {
    'netflix':    (50, 10, 100, 128, 0.01, 0.25, 1, -57.22821),
    'jester':     (50, 30, 150, 100, 0.01, 0.25, 4, -52.332),
    'pumsb_star': (50, 30, 100, 64, 0.01, 0.25, 1, -34.34381),
    'accidents':  (15, 30, 200, 128, 0.01, 0.25, 1, -38.94961),
    'bbc':        (20, 30, 150, 100, 0.001, 0.25, 4, -255.84138),
}

VARIANTS = {
    'v0-default': {},
    'v1-highest': {'precision': 'highest'},
    'v2-highest-pn': {'precision': 'highest', 'fan_mode': 'per_network'},
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', type=str, default=None)
    ap.add_argument('--variants', type=str, default=None)
    ap.add_argument('--jsonl', type=str, default='logs/ablate_repro.jsonl')
    args = ap.parse_args()

    names = args.only.split(',') if args.only else list(CELLS)
    variants = (args.variants.split(',') if args.variants
                else list(VARIANTS))
    os.makedirs(os.path.dirname(os.path.abspath(args.jsonl)), exist_ok=True)
    with open(args.jsonl, 'a', buffering=1) as jf:
        for name in names:
            k, d, e, b, lr, c, s, recorded = CELLS[name]
            for v in variants:
                exp = ExperimentConfig(name=name, embedding=k, dim=d,
                                       batch=b, epoch=e, rate=lr, cost=c,
                                       ema=True, seed=s, note=f'ablate-{v}',
                                       **VARIANTS[v])
                t0 = time.time()
                try:
                    res = run_experiment(exp)
                    rec = dict(name=name, variant=v, ok=True,
                               recorded_best=recorded, **res)
                except Exception as err:  # noqa: BLE001
                    rec = dict(name=name, variant=v, ok=False,
                               recorded_best=recorded, error=str(err))
                rec['wall'] = round(time.time() - t0, 1)
                jf.write(json.dumps(rec) + '\n')
                print(f"{name} {v}: "
                      + (f"pll-test={rec['pll_test']:.5f} "
                         f"(recorded {recorded})"
                         if rec['ok'] else f"FAILED {rec['error']}"),
                      flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
