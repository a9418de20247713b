#!/usr/bin/env python
"""Benchmark driver: stage-1 training throughput (samples/sec/chip) on the
canonical nltcs configuration (K=50 D=10 bs=128 EMA — the reference's
best_so_far hyperparameters, data/trw/SUMMARY.txt).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md).
The baseline proxy is 40,000 samples/sec — a TF2-GPU Keras `fit` bound for
this model: Keras dispatches one graph per step from Python at ~3 ms/step
floor on small models, i.e. ~128/0.003 ≈ 42.7k samples/sec. Our whole-epoch
`lax.scan` removes that per-step dispatch entirely.

Extra diagnostics (stage-2 eval wall, PLL quality) go to stderr.
"""

import json
import sys
import time

BASELINE_SAMPLES_PER_SEC = 40_000.0  # TF2-GPU Keras per-step dispatch proxy


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

    # warmup epochs (compile + codebook settling)
    for e in range(3):
        state, m = trainer.run_epoch(state, data,
                                     jax.random.fold_in(jax.random.PRNGKey(0), e))
    jax.block_until_ready(m)

    epochs = 50
    t0 = time.time()
    for e in range(epochs):
        state, m = trainer.run_epoch(state, data,
                                     jax.random.fold_in(jax.random.PRNGKey(1), e))
    jax.block_until_ready(m)
    train_wall = time.time() - t0
    samples_per_sec = epochs * len(y) / train_wall

    # quality + stage-2 wall-clock as secondary diagnostics
    t1 = time.time()
    s2 = Stage2(cfg)
    dist = s2.cpt(state.params, trainer.codebook(state), y)
    pll_test = s2.pseudo_log_likelihood(state.params, trainer.codebook(state),
                                        y_test, dist)
    eval_wall = time.time() - t1
    print(f'device={jax.devices()[0]} steady-state {epochs} epochs '
          f'in {train_wall:.3f}s; stage-2 (cpt + test PLL incl compile) '
          f'{eval_wall:.3f}s; pll-test={pll_test:.5f}', file=sys.stderr)

    print(json.dumps({
        'metric': 'stage-1 train throughput (nltcs K=50 D=10 bs=128 EMA)',
        'value': round(samples_per_sec, 1),
        'unit': 'samples/sec/chip',
        'vs_baseline': round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
