#!/usr/bin/env python
"""Tuning round 2: targeted cells from round-1 findings.

Findings driving this grid (logs/tune.jsonl):
- lr=0.01 diverges / collapses on most datasets; 1e-3 is the stable region.
- K=100 beat K=50 wherever it trained stably -> push K further.
- Large-n datasets collapse to one code with the reference's stacked-fan
  init (tiny latents); fan_mode=per_network restores code diversity
  (students -152 -> -133, dna -> -99.4).
Appends to the same JSONL as round 1; `tune.py --report` picks best-by-valid.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgmvae_tpu.driver import ExperimentConfig, run_experiment  # noqa: E402

CELLS = [
    # name, dict(...)
    ('students_03_02-0000', dict(embedding=200, dim=10, epoch=200, batch=128,
                                 rate=0.001, seed=1, fan_mode='per_network')),
    ('students_03_02-0000', dict(embedding=500, dim=20, epoch=200, batch=128,
                                 rate=0.001, seed=1, fan_mode='per_network')),
    ('students_03_02-0000', dict(embedding=1000, dim=20, epoch=300, batch=128,
                                 rate=0.001, seed=1, fan_mode='per_network')),
    ('50-17-8', dict(embedding=200, dim=20, epoch=200, batch=128, rate=0.001,
                     seed=1, fan_mode='per_network')),
    ('50-17-8', dict(embedding=500, dim=20, epoch=200, batch=128, rate=0.001,
                     seed=1, fan_mode='per_network')),
    ('dna', dict(embedding=100, dim=10, epoch=300, batch=100, rate=0.001,
                 seed=4, fan_mode='per_network')),
    ('dna', dict(embedding=200, dim=10, epoch=300, batch=100, rate=0.001,
                 seed=4, fan_mode='per_network', cost=0.1)),
    ('bbc', dict(embedding=20, dim=30, epoch=150, batch=100, rate=0.003,
                 seed=4, fan_mode='per_network', cost=0.1, decay=0.9)),
    ('bbc', dict(embedding=50, dim=30, epoch=150, batch=100, rate=0.001,
                 seed=4, fan_mode='per_network', cost=0.1)),
    ('bbc', dict(embedding=50, dim=10, epoch=300, batch=50, rate=0.001,
                 seed=4, fan_mode='per_network', cost=0.1, decay=0.9)),
    ('netflix', dict(embedding=100, dim=10, epoch=100, batch=128, rate=0.001,
                     seed=1)),
    ('netflix', dict(embedding=200, dim=10, epoch=150, batch=128, rate=0.001,
                     seed=1)),
    ('netflix', dict(embedding=100, dim=10, epoch=100, batch=128, rate=0.001,
                     seed=4)),
    ('audio', dict(embedding=100, dim=10, epoch=150, batch=100, rate=0.001,
                   seed=1)),
    ('audio', dict(embedding=200, dim=10, epoch=150, batch=100, rate=0.001,
                   seed=4)),
    ('jester', dict(embedding=100, dim=30, epoch=150, batch=100, rate=0.001,
                    seed=1)),
    ('bn2o-30-20-200-2a', dict(embedding=100, dim=10, epoch=200, batch=128,
                               rate=0.001, seed=1, fan_mode='per_network')),
    ('bn2o-30-20-200-2a', dict(embedding=100, dim=30, epoch=200, batch=128,
                               rate=0.003, seed=1)),
    ('accidents', dict(embedding=200, dim=30, epoch=200, batch=128,
                       rate=0.003, seed=1)),
    ('plants', dict(embedding=200, dim=30, epoch=100, batch=256, rate=0.003,
                    seed=1)),
    ('pumsb_star', dict(embedding=100, dim=30, epoch=200, batch=64,
                        rate=0.001, seed=1)),
    ('nltcs', dict(embedding=100, dim=10, epoch=100, batch=128, rate=0.003,
                   seed=4)),
]


def main() -> int:
    jsonl = sys.argv[1] if len(sys.argv) > 1 else 'logs/tune.jsonl'
    done = set()
    if os.path.exists(jsonl):
        with open(jsonl) as f:
            for line in f:
                try:
                    done.add(json.loads(line)['identifier'])
                except Exception:  # noqa: BLE001
                    pass
    with open(jsonl, 'a', buffering=1) as jf:
        for name, kw in CELLS:
            note = 'tune-pn' if kw.get('fan_mode') == 'per_network' else 'tune'
            exp = ExperimentConfig(name=name, ema=True, note=note, **kw)
            if exp.identifier in done:
                continue
            t0 = time.time()
            try:
                res = run_experiment(exp)
                rec = dict(name=name, ok=True, **res)
                print(f"{name} {kw}: valid {res['pll_valid']:.4f} "
                      f"test {res['pll_test']:.4f}", flush=True)
            except Exception as err:  # noqa: BLE001
                rec = dict(name=name, ok=False, identifier=exp.identifier,
                           error=str(err)[:500])
                print(f'{name} FAILED: {err}', flush=True)
            rec['wall'] = round(time.time() - t0, 1)
            jf.write(json.dumps(rec) + '\n')
    return 0


if __name__ == '__main__':
    sys.exit(main())
