#!/usr/bin/env python
"""Tuning campaign: our own hyperparameter search per dataset, aiming to BEAT
the reference's recorded best PLLs (data/trw/SUMMARY.txt) rather than just
reproduce them. Model selection is honest: the best cell is chosen by
**validation** PLL and reported on **test**.

The grid starts from the reference's per-dataset best hypers and varies
learning rate and seed (the reference's own results show lr is the unstable
axis — e.g. its pumsb_star cell diverges at lr=0.01), plus a couple of
codebook-size variants. Results accumulate in a JSONL (resumable like
run_pipeline) and `--report` regenerates RESULTS.md with both the
reproduction row and our tuned row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgmvae_tpu.driver import ExperimentConfig, run_experiment  # noqa: E402
from pgmvae_tpu.registry import REGISTRY  # noqa: E402
from scripts.reproduce_baselines import BEST  # noqa: E402


def grid_for(name: str):
    k, d, e, b, lr0, c, s0, _ = BEST[name]
    cells = []
    for lr in (0.01, 0.003, 0.001):
        for seed in (1, 2):
            cells.append(dict(embedding=k, dim=d, epoch=e, batch=b, rate=lr,
                              cost=c, seed=seed))
    for kk, dd in ((100, d), (k, 30 if d != 30 else 10)):
        cells.append(dict(embedding=kk, dim=dd, epoch=e, batch=b, rate=0.003,
                          cost=c, seed=1))
    return cells


def run(args) -> None:
    done = set()
    if os.path.exists(args.jsonl):
        with open(args.jsonl) as f:
            for line in f:
                try:
                    done.add(json.loads(line)['identifier'])
                except Exception:  # noqa: BLE001
                    pass
    names = args.only.split(',') if args.only else list(BEST)
    os.makedirs(os.path.dirname(os.path.abspath(args.jsonl)), exist_ok=True)
    with open(args.jsonl, 'a', buffering=1) as jf:
        for name in names:
            for cell in grid_for(name):
                exp = ExperimentConfig(name=name, ema=True, note='tune',
                                       **cell)
                if exp.identifier in done:
                    continue
                t0 = time.time()
                try:
                    res = run_experiment(exp)
                    rec = dict(name=name, ok=True, **res)
                    print(f"{name} lr={cell['rate']} s={cell['seed']} "
                          f"K={cell['embedding']} D={cell['dim']}: "
                          f"valid {res['pll_valid']:.4f} "
                          f"test {res['pll_test']:.4f}", flush=True)
                except Exception as err:  # noqa: BLE001
                    rec = dict(name=name, ok=False,
                               identifier=exp.identifier, error=str(err)[:500])
                    print(f'{name} {exp.identifier} FAILED: {err}', flush=True)
                rec['wall'] = round(time.time() - t0, 1)
                jf.write(json.dumps(rec) + '\n')


def report(args) -> None:
    # best-by-valid per dataset from the tune jsonl + reproduction jsonl
    tuned = {}
    with open(args.jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if not rec.get('ok'):
                continue
            cur = tuned.get(rec['name'])
            if cur is None or rec['pll_valid'] > cur['pll_valid']:
                tuned[rec['name']] = rec
    repro = {}
    if os.path.exists(args.repro_jsonl):
        with open(args.repro_jsonl) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get('ok'):
                    repro[rec['name']] = rec

    lines = [
        '# RESULTS — test-set PLL vs the reference',
        '',
        'Two columns of ours: **repro** uses the reference\'s own best '
        'hyperparameters verbatim (`data/trw/SUMMARY.txt`); **tuned** is our '
        'sweep (scripts/tune.py), cell chosen by *validation* PLL, reported '
        'on *test*. "Repo best" = the TF2 reference\'s recorded result; '
        '"paper" = Chou et al. AAAI 2018. Higher (less negative) is better. '
        'One TPU v5e chip.',
        '',
        '| dataset | vars | repro | tuned (ours) | repo best | paper | '
        'ours vs repo | tuned hypers |',
        '|---|---|---|---|---|---|---|---|',
    ]
    for name in BEST:
        info = REGISTRY[name]
        rb = BEST[name][7]
        t = tuned.get(name)
        r = repro.get(name)
        repro_s = f"{r['pll_test']:.4f}" if r else 'OOM/fail'
        if t:
            tuned_s = f"{t['pll_test']:.4f}"
            ident = t['identifier']
            hyp = ident.split('-', 1)[1] if '-' in ident else ident
            hyp = ident.replace(name + '_', '').replace('_ema-True', '') \
                .replace('_gma-0.99', '').replace('-tune', '')
            if rb is None:
                vs = 'n/a (no repo record)'
            else:
                vs = (f'+{t["pll_test"] - rb:.3f} (better)'
                      if t['pll_test'] > rb else f'{t["pll_test"] - rb:.3f}')
        else:
            tuned_s, hyp, vs = '—', '—', '—'
        rb_s = f'{rb:.3f}' if rb is not None else '—'
        lines.append(f"| {name} | {info.n_var} | {repro_s} | {tuned_s} | "
                     f"{rb_s} | {-info.paper_pll} | {vs} | {hyp} |")
    lines += ['', f'Generated {time.strftime("%Y-%m-%d %H:%M")} by '
              'scripts/tune.py --report.']
    with open(args.out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f'wrote {args.out}')


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--jsonl', default='logs/tune.jsonl')
    ap.add_argument('--repro-jsonl', default='logs/reproduce.jsonl')
    ap.add_argument('--only', default=None)
    ap.add_argument('--report', action='store_true')
    ap.add_argument('--out', default='RESULTS.md')
    args = ap.parse_args()
    if args.report:
        report(args)
    else:
        run(args)
    return 0


if __name__ == '__main__':
    sys.exit(main())
