#!/usr/bin/env python
"""CMLL campaign (VERDICT round 1, weak #7 / next-round #7): train each
locally-runnable dataset at its tuned-best hyperparameters (RESULTS.md) and
evaluate CMLL via blockwise Gibbs exactly as the reference would have
(p1 = n_var//10, num_smp=3000, burn_in=150 — reference `run.py:74`,
`core/model.py:110-148`), recording the Gibbs wall-clock separately.

Appends JSON lines to logs/cmll.jsonl. Resumable: datasets already present
in the log are skipped (pass --force to redo).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgmvae_tpu.driver import (ExperimentConfig, run_experiment,  # noqa: E402
                               run_packed_experiments)

NOTE = 'cmll-r3'

# Tuned-best cells from RESULTS.md (round-1 campaign; dcr threshold 1.0 for
# the cells whose winning note carried -dcr).
CELLS = {
    'nltcs': dict(embedding=100, dim=10, batch=128, epoch=100, rate=0.003),
    'audio': dict(embedding=200, dim=10, batch=100, epoch=150, rate=0.001,
                  seed=4),
    'jester': dict(embedding=100, dim=30, batch=100, epoch=150, rate=0.001),
    'netflix': dict(embedding=500, dim=10, batch=128, epoch=300, rate=0.001,
                    seed=2, dead_code_threshold=1.0),
    'accidents': dict(embedding=500, dim=30, batch=128, epoch=200,
                      rate=0.003, dead_code_threshold=1.0),
    'plants': dict(embedding=500, dim=30, batch=256, epoch=150, rate=0.003,
                   dead_code_threshold=1.0),
    'pumsb_star': dict(embedding=200, dim=30, batch=64, epoch=200,
                       rate=0.001, dead_code_threshold=1.0),
    'dna': dict(embedding=200, dim=10, batch=100, epoch=300, rate=0.001,
                cost=0.1, seed=4, fan_mode='per_network'),
    # round-2 winning recipe (RESULTS.md): b25 keeps each 64-epoch scan
    # block under the remote worker's per-execution watchdog (the round-1
    # b12 recipe packs ~9k steps/execution and crashes the worker)
    'bbc': dict(embedding=50, dim=20, batch=25, epoch=600, rate=0.003,
                cost=0.05, decay=0.9, seed=3, dead_code_threshold=0.25,
                fan_mode='per_network', select_on_valid=50),
    '50-17-8': dict(embedding=500, dim=30, batch=64, epoch=300, rate=0.001,
                    dead_code_threshold=1.0),
    'bn2o-30-20-200-2a': dict(embedding=50, dim=30, batch=128, epoch=100,
                              rate=0.003),
    'students_03_02-0000': dict(embedding=500, dim=30, batch=32, epoch=600,
                                rate=0.001, dead_code_threshold=1.0),
}


def regen_winners(joblog: str) -> dict:
    """Per-dataset best-valid cell from a sweep joblog, as ExperimentConfig
    kwargs (round 3: CMLL must be evaluated on the REGENERATED tuned bests,
    not the round-1 recipes hardcoded in CELLS).

    Recipes are recovered with the verified round-trip parser
    (pgmvae_tpu.utils.logging.parse_identifier): a winner whose identifier
    cannot be reconstructed byte-identically is skipped LOUDLY rather than
    silently re-measured at a different recipe (round-3 advisor finding)."""
    from collections import defaultdict

    from pgmvae_tpu.utils.logging import parse_identifier
    by_ds = defaultdict(list)
    with open(joblog) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get('ok'):
                by_ds[rec['identifier'].split('_K-')[0]].append(rec)
    out = {}
    for name, recs in by_ds.items():
        best = max({r['identifier']: r for r in recs}.values(),
                   key=lambda r: r['pll_valid'])
        try:
            kw = parse_identifier(best['identifier'])
        except ValueError as e:
            print(f'{name}: SKIPPED (unparseable winner identifier): {e}',
                  file=sys.stderr)
            continue
        assert kw.pop('name') == name, (kw, name)
        kw.pop('note', None)     # campaign note is not part of the recipe
        if kw.get('packed_seeds', 1) > 1:
            # a pk-S winner only regenerates inside its packed program:
            # recover the group's seed set from its joblog siblings so the
            # CMLL run can rebuild the exact program
            ref = {f: v for f, v in kw.items() if f != 'seed'}
            sibs = set()
            for r in recs:
                try:
                    k2 = parse_identifier(r['identifier'])
                except ValueError:
                    continue
                k2.pop('name'), k2.pop('note', None)
                if {f: v for f, v in k2.items() if f != 'seed'} == ref:
                    sibs.add(k2['seed'])
            kw['_pack_group_seeds'] = sorted(sibs)
        out[name] = kw
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', type=str, default=None,
                    help='comma-separated dataset subset')
    ap.add_argument('--force', action='store_true')
    ap.add_argument('--from-regen', type=str, default=None, metavar='JOBLOG',
                    help='override CELLS with per-dataset best-valid winners '
                         'from this sweep joblog (logs/regen-r3.jsonl)')
    ap.add_argument('--out', default='logs/cmll.jsonl')
    ap.add_argument('--retries', type=int, default=2,
                    help='bounded auto-retries per dataset when the remote '
                         'TPU worker crashes mid-cell (round-2 required '
                         'manual reruns)')
    args = ap.parse_args()

    cells = dict(CELLS)
    if args.from_regen:
        for name, kw in regen_winners(args.from_regen).items():
            print(f'{name}: recipe from regen winner {kw}', file=sys.stderr)
            cells[name] = kw

    done = set()
    if os.path.exists(args.out) and not args.force:
        with open(args.out) as f:
            for line in f:
                try:
                    done.add(json.loads(line)['name'])
                except (json.JSONDecodeError, KeyError):
                    pass

    # cheapest Gibbs chains first (steps = num_smp * n_var//10; bbc's
    # 315k-step chain goes last so a timeout loses the least coverage)
    order = ['nltcs', 'bn2o-30-20-200-2a', 'plants', 'jester', 'audio',
             'netflix', 'accidents', 'pumsb_star', 'dna', '50-17-8',
             'students_03_02-0000', 'bbc']
    names = (args.only.split(',') if args.only else order)
    for name in names:
        if name in done:
            print(f'{name}: already done, skipping', file=sys.stderr)
            continue
        kw = dict(cells[name])
        kw.setdefault('seed', 1)
        kw.setdefault('cost', 0.25)
        kw.setdefault('decay', 0.99)
        kw.setdefault('ema', True)
        group_seeds = kw.pop('_pack_group_seeds', None)
        if group_seeds:
            # pk-S winner: rebuild the exact packed program (same width,
            # same seed lanes) and keep the winner seed's record
            exps = [ExperimentConfig(name=name, note=NOTE, cmll=True,
                                     **{**kw, 'seed': s})
                    for s in group_seeds]
            target = group_seeds.index(kw['seed'])

            def run_cell():
                return run_packed_experiments(exps)[target]
        else:
            exp = ExperimentConfig(name=name, note=NOTE, cmll=True, **kw)

            def run_cell():
                return run_experiment(exp)
        t0 = time.time()
        for attempt in range(1 + max(args.retries, 0)):
            try:
                res = run_cell()
                rec = {'name': name, 'ok': True, **res,
                       'wall': round(time.time() - t0, 1)}
                break
            except Exception as e:  # noqa: BLE001 — record and continue
                rec = {'name': name, 'ok': False,
                       'error': f'{type(e).__name__}: {e}'[:400],
                       'wall': round(time.time() - t0, 1)}
                transient = 'crashed or restarted' in str(e) \
                    or 'UNAVAILABLE' in str(e)
                if not transient or attempt == args.retries:
                    break
                print(f'{name}: TPU worker crash, retrying '
                      f'({attempt + 1}/{args.retries})', file=sys.stderr)
                time.sleep(20)      # give the worker time to come back
        with open(args.out, 'a') as f:
            f.write(json.dumps(rec) + '\n')
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
