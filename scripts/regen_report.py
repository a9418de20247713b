#!/usr/bin/env python
"""Summarize a sweep joblog: per-dataset winner by VALID PLL (reported on
test), as used for the round-3 tuned-table regeneration (logs/regen-r3.jsonl).

Prints a markdown table plus the per-dataset winning cell as JSON (the
winning identifier regenerates its number by construction — every knob is
encoded explicitly)."""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('joblog', nargs='?', default='logs/regen-r3.jsonl')
    ap.add_argument('--all', action='store_true',
                    help='print every cell, not only the winners')
    args = ap.parse_args()

    by_ds = defaultdict(list)
    with open(args.joblog) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not rec.get('ok'):
                continue
            name = rec['identifier'].split('_K-')[0]
            by_ds[name].append(rec)

    print('| dataset | cells | best valid PLL | test PLL | identifier |')
    print('|---|---|---|---|---|')
    winners = {}
    for name, recs in sorted(by_ds.items()):
        # dedupe re-runs of the same identifier (last wins)
        uniq = {r['identifier']: r for r in recs}
        best = max(uniq.values(), key=lambda r: r['pll_valid'])
        winners[name] = best
        print(f"| {name} | {len(uniq)} | {best['pll_valid']:.4f} "
              f"| {best['pll_test']:.4f} | {best['identifier']} |")
        if args.all:
            for r in sorted(uniq.values(), key=lambda r: -r['pll_valid']):
                print(f"|   · | | {r['pll_valid']:.4f} | {r['pll_test']:.4f} "
                      f"| {r['identifier']} |")
    print()
    for name, best in sorted(winners.items()):
        print(json.dumps({k: best[k] for k in
                          ('identifier', 'pll_train', 'pll_valid', 'pll_test',
                           'best_epoch') if k in best}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
