#!/usr/bin/env python
"""Joint-code CPT quality campaign (VERDICT r2, next-round #5).

For each structured dataset where the paper-vs-rebuild gap is largest
(students, 50-17-8, pumsb_star, accidents), take the round-3 regenerated
tuned winner (logs/regen-r3.jsonl, best valid PLL) and re-run the SAME
recipe with `--cpt-parents-eval M1,M2,...`: stage-2 tables become
p(y_v=1 | code_v, y_parents(v)) with the M highest-MI partner variables as
parents (pgmvae_tpu/stage2.py:select_parents). Training is unchanged —
only the stage-2 conditioning set grows — so any PLL movement is purely
the quality lever being measured, and ONE training per dataset yields the
whole M sweep (post-hoc eval; the M=0 control is the primary record).

Cells are dispatched through run_pipeline.py (packed seeds, joblog
resumable, subprocess isolation), so every resulting identifier
regenerates its number.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgmvae_tpu.utils.logging import parse_identifier as _parse  # noqa: E402

# recipe fields the run_pipeline command below forwards; a winner carrying
# any OTHER non-default field would be silently re-run without it — refuse.
_FORWARDED = {'name', 'embedding', 'dim', 'batch', 'epoch', 'rate', 'cost',
              'ema', 'decay', 'seed', 'note', 'dead_code_threshold',
              'select_on_valid',
              'packed_seeds'}   # the campaign itself packs 3 seeds, same
#                                 width as the regen campaign's pk-3 cells

DATASETS = ['accidents', 'pumsb_star', '50-17-8', 'students_03_02-0000']


def winners(joblog: str) -> dict:
    by_ds = defaultdict(list)
    with open(joblog) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get('ok'):
                by_ds[rec['identifier'].split('_K-')[0]].append(rec)
    return {n: max({r['identifier']: r for r in rs}.values(),
                   key=lambda r: r['pll_valid'])
            for n, rs in by_ds.items()}


def parse_identifier(ident: str) -> dict:
    """Recover the CLI recipe from a winner identifier — via the verified
    round-trip parser (pgmvae_tpu.utils.logging.parse_identifier), so the
    campaign can never silently run a different recipe than the winner it
    claims to re-measure (round-3 advisor finding). Raises ValueError on
    any lossy parse."""
    import dataclasses

    from pgmvae_tpu.driver import ExperimentConfig
    kw = _parse(ident)
    defaults = {f.name: f.default for f in dataclasses.fields(ExperimentConfig)}
    extra = {f for f, v in kw.items()
             if f not in _FORWARDED and v != defaults.get(f, v)}
    if extra or not kw.get('ema', False):
        raise ValueError(f'winner {ident!r} carries recipe fields this '
                         f'campaign does not forward: {sorted(extra)}')
    return dict(name=kw['name'], k=str(kw['embedding']), d=str(kw['dim']),
                b=str(kw['batch']), e=str(kw['epoch']), r=repr(kw['rate']),
                c=repr(kw['cost']), g_=repr(kw['decay']),
                dcr=repr(kw.get('dead_code_threshold', 0.0)),
                sov=str(kw.get('select_on_valid', 0)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--joblog-in', default='logs/regen-r3.jsonl')
    ap.add_argument('--joblog', default='logs/cptp-r3.jsonl')
    ap.add_argument('--result-file', default='logs/cptp-r3-result.txt')
    ap.add_argument('--parents', default='1,2,3')
    ap.add_argument('--seeds', default='1,2,3')
    ap.add_argument('--only', default=None)
    ap.add_argument('--dry-run', action='store_true')
    args = ap.parse_args()

    win = winners(args.joblog_in)
    names = args.only.split(',') if args.only else DATASETS
    for name in names:
        if name not in win:
            print(f'{name}: no regen winner yet, skipping', file=sys.stderr)
            continue
        rec = parse_identifier(win[name]['identifier'])
        assert rec['name'] == name, (rec, name)
        cmd = [sys.executable, 'run_pipeline.py',
               '--joblog', args.joblog, '--result-file', args.result_file,
               '--pack-seeds', '3', '-m', '--isolate',
               '--cell-timeout', '7200',
               '-n', name, '-k', rec['k'], '-d', rec['d'],
               '-b', rec['b'], '-e', rec['e'], '-r', rec['r'],
               '-c', rec['c'], '-g', rec['g_'],
               '--dead-code-threshold', rec['dcr'],
               '--select-on-valid', rec['sov'],
               '-s', args.seeds, '--cpt-parents-eval', args.parents]
        print('+', ' '.join(cmd), flush=True)
        if not args.dry_run:
            subprocess.run(['timeout', '21600', *cmd], check=False)
    print('cptp campaign done')
    return 0


if __name__ == '__main__':
    sys.exit(main())
