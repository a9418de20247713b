#!/usr/bin/env python
"""Winner report for the joint-code CPT campaign (VERDICT r3 #3).

Reads the campaign joblogs (CPU insurance cells + TPU campaign when it
ran), groups every record by its BASE identifier (the `_cptp-M`
retrained cells and `_cpe-M` post-hoc evals of one training collapse to
one group; M=0 is the primary record), selects the winning M by
validation PLL, and emits a markdown report comparing each dataset's
winner against the tuned-table best parsed from RESULTS.md and the
paper number carried in the joblog.

The same pattern as scripts/regen_report.py: RESULTS.md's prose cites
this report; the report regenerates from raw joblogs alone, so the two
can never silently diverge.

Usage: python scripts/cptp_report.py [--joblogs a.jsonl,b.jsonl]
           [--out logs/cptp-r4-report.md]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

# the cptp/cpe field may be followed by later-appended extension fields
# (run_identifier order: cptp < fl < pk < ad < cd), so anchor on "rest of
# string is only such fields" instead of end-of-string — a packed or
# fused-adam cptp cell must land in the same sweep group as its siblings
# (round-4 advisor finding)
_SUFFIX = re.compile(
    r'_(?:cptp|cpe)-(\d+)'
    r'(?=(?:_(?:fl-(?:rank1|auto)|pk-\d+|ad-\w+|cd-bf16))*$)')

# mixed per-variable parent-count records (driver cpt_parents_mix): the
# full cpe candidate list + the bare cpm flag, always the identifier tail
_MIX = re.compile(r'_cpe-[0-9.]+_cpm$')


def _mkey(m):
    """Sort key over sweep Ms: ints ascending, then the 'mix' record."""
    return (1, 0) if m == 'mix' else (0, m)


def split_m(ident: str):
    """(base identifier with the cptp/cpe/cpm fields removed, M).
    M is an int for global-M records, the string 'mix' for per-variable
    mixed records."""
    mx = _MIX.search(ident)
    if mx:
        return ident[:mx.start()], 'mix'
    mm = _SUFFIX.search(ident)
    if not mm:
        return ident, 0
    return ident[:mm.start()] + ident[mm.end():], int(mm.group(1))

DEFAULT_JOBLOGS = ['logs/cptp-cpu-r4.jsonl', 'logs/cptp-small-r4.jsonl',
                   'logs/cptp-r3.jsonl', 'logs/cptp-r4.jsonl',
                   'logs/cptp-gap-r5.jsonl', 'logs/cptp-students-r5.jsonl',
                   'logs/cptp-students-hiM.jsonl', 'logs/cptp-cmll-r5.jsonl',
                   'logs/cptp-gap-hiM.jsonl', 'logs/cptp-students-hiM2.jsonl',
                   'logs/cptp-gap-hiM2.jsonl', 'logs/cptp-mix-gap.jsonl',
                   'logs/cptp-students-mix.jsonl',
                   'logs/cptp-dna-mix.jsonl',
                   'logs/cptp-small-mix.jsonl',
                   'logs/cptp-mix-seeds.jsonl',
                   'logs/cptp-mix-cmll.jsonl']


def tuned_bests(results_md: str) -> dict:
    """dataset -> tuned test PLL from RESULTS.md's tuned table (column 4).

    RESULTS.md holds several markdown tables; the tuned table is the one
    whose header row is `| dataset | vars | repro | tuned (ours) | ...` —
    rows are only collected while inside that table."""
    best = {}
    if not os.path.exists(results_md):
        return best
    in_tuned = False
    for line in open(results_md):
        cols = [c.strip() for c in line.split('|')]
        if len(cols) > 3 and cols[1] == 'dataset':
            in_tuned = cols[2] == 'vars'
            continue
        if not line.startswith('|'):
            in_tuned = False
            continue
        if in_tuned and len(cols) >= 8 and cols[1] and not cols[1].startswith('-'):
            try:
                best[cols[1]] = float(cols[4])
            except ValueError:
                continue
    return best


def collect(joblogs) -> dict:
    """base identifier -> {M: record}; later duplicates win (rerun = newest)."""
    groups = defaultdict(dict)
    for path in joblogs:
        if not os.path.exists(path):
            continue
        for line in open(path):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not rec.get('ok'):
                continue
            base, m = split_m(rec['identifier'])
            groups[base][m] = rec
    return groups


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--joblogs', default=','.join(DEFAULT_JOBLOGS))
    ap.add_argument('--results-md', default='RESULTS.md')
    ap.add_argument('--out', default='logs/cptp-r5-report.md')
    args = ap.parse_args()

    groups = collect(args.joblogs.split(','))
    bests = tuned_bests(args.results_md)

    lines = ['# Joint-code CPT campaign — winner report',
             '',
             f'Regenerated from `{args.joblogs}` by scripts/cptp_report.py.',
             'Winner M selected by validation PLL; "tuned best" parsed from',
             'the RESULTS.md tuned table; delta = winner test − tuned best',
             '(positive = the joint-CPT lever beats the tuned table).', '',
             '| dataset | base identifier | winner M (by valid) | '
             'test @ winner | CMLL @ winner | tuned best | delta | paper |',
             '|---|---|---|---|---|---|---|---|']
    summary = []
    for base in sorted(groups):
        ms = groups[base]
        if len(ms) < 2:
            continue                     # no lever sweep, just a lone cell
        name = base.split('_K-')[0]
        win_m = max(ms, key=lambda m: ms[m]['pll_valid'])
        win = ms[win_m]
        tuned = bests.get(name)
        delta = (win['pll_test'] - tuned) if tuned is not None else None
        # post-hoc _cpe-M records don't carry paper_pll; take the group's
        paper = next((ms[m].get('paper_pll') for m in sorted(ms, key=_mkey)
                      if ms[m].get('paper_pll') is not None), None)
        # cmll_test == 1 is the reference's CMLL-off sentinel (run.py:77);
        # a real CMLL (driver --cmll, incl. composed mixtures) is negative
        cmll = win.get('cmll_test', 1)
        cmll_s = f'{cmll:.4f}' if cmll != 1 else '—'
        lines.append(
            f"| {name} | `{base}` | {win_m} | {win['pll_test']:.4f} | "
            f"{cmll_s} | "
            f"{tuned if tuned is not None else 'n/a'} | "
            f"{f'{delta:+.2f}' if delta is not None else 'n/a'} | "
            f"{paper if paper is not None else 'n/a'} |")
        summary.append({'dataset': name, 'base': base, 'winner_m': win_m,
                        'pll_test': win['pll_test'],
                        'pll_valid': win['pll_valid'],
                        'cmll_test': None if cmll == 1 else cmll,
                        'm_tested': sorted(ms, key=_mkey),
                        'tuned_best': tuned, 'delta_vs_tuned': delta,
                        'paper': paper,
                        'platform': win.get('platform', 'tpu')})
    lines += ['', '## Full M sweeps', '']
    for base in sorted(groups):
        ms = groups[base]
        if len(ms) < 2:
            continue
        lines.append(f'- `{base}`: ' + ', '.join(
            f"M={m}: {ms[m]['pll_test']:.4f}" for m in sorted(ms, key=_mkey)))
    out = '\n'.join(lines) + '\n'
    with open(args.out, 'w') as f:
        f.write(out)
    print(out)
    print(json.dumps({'datasets': summary}), file=sys.stderr)
    return 0


if __name__ == '__main__':
    sys.exit(main())
