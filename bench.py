#!/usr/bin/env python
"""Benchmark driver: stage-1 training throughput (samples/sec/chip) on the
canonical nltcs configuration (K=50 D=10 bs=128 EMA — the reference's
best_so_far hyperparameters, data/trw/SUMMARY.txt).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

Timing is HONEST under the remote-dispatch backend: the clock stops only
after `jax.device_get` of the epoch metrics, which forces the full remote
execution drain (`block_until_ready` on this backend acknowledges enqueue,
not completion — round-1's 16M samples/sec was an enqueue rate).

vs_baseline: the denominator is the MEASURED throughput of the actual TF2
reference (driven unmodified by scripts/bench_reference_tf.py on this
host's CPU; methodology + GPU-bound discussion in BASELINE.md). It is
re-measured live each run when TF is importable; otherwise the recorded
measurement below is used.

Extra diagnostics (stage-2 eval wall, PLL quality) go to stderr.
"""

import json
import os
import subprocess
import sys
import time

# scripts/bench_reference_tf.py -n nltcs --epochs 5 on this host
# (TF 2.21 CPU, oneDNN): 34585.1 samples/sec, 3.684 ms/step at bs=128.
TF2_MEASURED_FALLBACK = 34585.1


def measure_tf2_baseline() -> tuple:
    """Measured TF2-reference samples/sec (live if possible)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'scripts', 'bench_reference_tf.py')
    try:
        out = subprocess.run(
            [sys.executable, script, '-n', 'nltcs', '--epochs', '3'],
            capture_output=True, text=True, timeout=420)
        line = out.stdout.strip().splitlines()[-1]
        sps = float(json.loads(line)['samples_per_sec'])
        return sps, 'measured live (TF2 reference on host CPU)'
    except Exception as e:  # noqa: BLE001 — fall back to the recorded number
        return TF2_MEASURED_FALLBACK, f'recorded measurement (live run failed: {type(e).__name__})'


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pgmvae_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pgmvae_tpu.data import load_split
    from pgmvae_tpu.models import VqVaeConfig
    from pgmvae_tpu.stage2 import Stage2
    from pgmvae_tpu.train import Trainer

    y = load_split('nltcs', 'train')
    y_test = load_split('nltcs', 'test')
    cfg = VqVaeConfig(n_var=16, units=(15, 14, 13, 12), dim=10, num_codes=50,
                      cost=0.25, decay=0.99, quantizer='ema')
    trainer = Trainer(cfg, 0.01, 128, len(y))
    state = trainer.init_state(jax.random.PRNGKey(1))
    data = jnp.asarray(y)

    # warmup: compiles the 64-epoch block program + settles the codebook;
    # device_get forces real completion
    state, m = trainer.run_epochs(state, data, jax.random.PRNGKey(0), 0, 64)
    jax.device_get(m)

    epochs = 64                       # one 64-epoch block execution
    t0 = time.time()
    state, m = trainer.run_epochs(state, data, jax.random.PRNGKey(1),
                                  0, epochs)
    jax.device_get(m)                 # honest: full remote drain
    train_wall = time.time() - t0
    samples_per_sec = epochs * len(y) / train_wall

    # quality + stage-2 wall-clock as secondary diagnostics
    t1 = time.time()
    s2 = Stage2(cfg)
    dist = s2.cpt(state.params, trainer.codebook(state), y)
    pll_test = s2.pseudo_log_likelihood(state.params, trainer.codebook(state),
                                        y_test, dist)
    eval_wall = time.time() - t1

    baseline_sps, how = measure_tf2_baseline()
    print(f'device={jax.devices()[0]} steady-state {epochs} epochs '
          f'in {train_wall:.3f}s (drained); stage-2 (cpt + test PLL incl '
          f'compile) {eval_wall:.3f}s; pll-test={pll_test:.5f}; '
          f'baseline {baseline_sps:.1f} samples/sec [{how}]', file=sys.stderr)

    print(json.dumps({
        'metric': 'stage-1 train throughput (nltcs K=50 D=10 bs=128 EMA)',
        'value': round(samples_per_sec, 1),
        'unit': 'samples/sec/chip',
        'vs_baseline': round(samples_per_sec / baseline_sps, 2),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
