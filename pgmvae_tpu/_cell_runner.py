"""Subprocess entry point for isolated sweep cells.

`run_pipeline.py --isolate` runs every (dataset x hyperparameter) cell in
a fresh process — the same isolation the reference got from GNU parallel
(`batch-job.sh:43`): a cell cannot leak device memory, compiled programs,
or a wedged TPU-tunnel state into the next one.

Reads one JSON-encoded ExperimentConfig kwargs dict on stdin, prints the
result dict as the LAST stdout line.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    from pgmvae_tpu.driver import (ExperimentConfig, run_experiment,
                                   run_packed_experiments)

    kw = json.load(sys.stdin)
    device = kw.pop('_device', 0)
    if device == -1:        # CPU pin — mirrors run.py's --device -1 (the
        import jax          # platform env var is overridden by the TPU
        jax.config.update('jax_platforms', 'cpu')   # plugin in this image)
    packed = kw.pop('_packed', None)
    if packed is not None:  # --pack-seeds cells: one vmapped device program
        cells = []
        for c in packed:
            if c.get('units'):
                c['units'] = tuple(c['units'])
            c['cpt_parents_eval'] = tuple(c.get('cpt_parents_eval', ()))
            cells.append(ExperimentConfig(**c))
        res = run_packed_experiments(cells)
    else:
        if kw.get('units'):
            kw['units'] = tuple(kw['units'])
        kw['cpt_parents_eval'] = tuple(kw.get('cpt_parents_eval', ()))
        res = run_experiment(ExperimentConfig(**kw))
    sys.stdout.flush()
    print(json.dumps(res), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
