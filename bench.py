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

import gc
import json
import os
import subprocess
import sys
import time

# scripts/bench_reference_tf.py -n nltcs on this host (TF 2.21 CPU,
# oneDNN): best observed 37019.2 samples/sec (idle host, round-5 bench
# log); an earlier 5-epoch run recorded 34585.1. The reference keeps its
# best number as the vs_baseline denominator (see measure_tf2_baseline).
TF2_MEASURED_FALLBACK = 37019.2

# TPU v5e (v5 lite) peak matmul throughput, bf16 — f32 model arithmetic
# runs on the MXU as bf16 passes under JAX's 'default' matmul precision,
# so this is the roofline the train step is measured against.
V5E_PEAK_FLOPS = 197e12


def train_flops_per_sample(cfg) -> float:
    """Analytic model FLOPs per trained sample (the MFU numerator).

    Matmul work per sample per network: 2*in*out per dense layer (encoder
    n->u0..->D, decoder D->..->n in the padded masked design) plus the
    2*D*K quantizer distance contraction; x n_var stacked networks;
    x3 for training (forward + both backward matmul passes)."""
    enc = [cfg.n_var, *cfg.units, cfg.dim]
    dec = [cfg.dim, *reversed(cfg.units), cfg.n_var]
    mm = sum(a * b for a, b in zip(enc[:-1], enc[1:]))
    mm += sum(a * b for a, b in zip(dec[:-1], dec[1:]))
    fwd = cfg.n_var * 2.0 * (mm + cfg.dim * cfg.effective_codes)
    return 3.0 * fwd


def bench_model(label, cfg, data_host, batch, lr, epochs,
                adam_impl='optax') -> dict:
    """Steady-state drained throughput + MFU for one model config."""
    import jax
    import jax.numpy as jnp

    from pgmvae_tpu.train import Trainer

    trainer = Trainer(cfg, lr, batch, len(data_host),
                      adam_impl=adam_impl)
    state = trainer.init_state(jax.random.PRNGKey(1))
    data = jnp.asarray(data_host, jnp.float32)

    # warmup compiles the same block program the timed run uses
    state, m = trainer.run_epochs(state, data, jax.random.PRNGKey(0),
                                  0, epochs)
    jax.device_get(m)
    t0 = time.time()
    state, m = trainer.run_epochs(state, data, jax.random.PRNGKey(1),
                                  0, epochs)
    jax.device_get(m)                 # honest: full remote drain
    wall = time.time() - t0
    sps = epochs * len(data_host) / wall
    fps = train_flops_per_sample(cfg)
    mfu = sps * fps / V5E_PEAK_FLOPS
    print(f'{label}: {epochs} epochs (bs={batch}) in {wall:.3f}s drained '
          f'-> {sps:,.0f} samples/sec/chip; model '
          f'{fps / 1e9:.2f} GFLOP/sample -> {sps * fps / 1e12:.2f} TFLOP/s '
          f'= {100 * mfu:.1f}% of v5e bf16 peak ({V5E_PEAK_FLOPS / 1e12:.0f} '
          f'TFLOP/s); loss={float(m.loss[-1]):.5f}', file=sys.stderr)
    del trainer, state, data, m
    # in-process sequential cells accumulate HBM until RESOURCE_EXHAUSTED
    # at bbc scale (round-5: the bf16 cell OOMed after 3 bbc cells);
    # dropping the executable cache costs one recompile per cell but keeps
    # the whole suite inside a v5e's 16 GB
    jax.clear_caches()
    gc.collect()
    return {'samples_per_sec': round(sps, 1),
            'gflop_per_sample': round(fps / 1e9, 3),
            'mfu_pct': round(100 * mfu, 2)}


def measure_tf2_baseline() -> tuple:
    """TF2-reference samples/sec: max(live measurement, recorded best).

    The live run shares the host CPU with whatever else is running; a
    loaded box starves TF2 and flatters vs_baseline (observed 11.3k
    samples/s loaded vs 37.0k idle — a 3.3x swing in the ratio that has
    nothing to do with this framework). The denominator is therefore the
    reference's BEST known number: the live measurement when it beats the
    recorded idle-host figure, the recorded figure otherwise."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'scripts', 'bench_reference_tf.py')
    try:
        out = subprocess.run(
            [sys.executable, script, '-n', 'nltcs', '--epochs', '3'],
            capture_output=True, text=True, timeout=420)
        line = out.stdout.strip().splitlines()[-1]
        sps = float(json.loads(line)['samples_per_sec'])
        if sps >= TF2_MEASURED_FALLBACK:
            return sps, 'measured live (TF2 reference on host CPU)'
        return TF2_MEASURED_FALLBACK, (
            f'recorded idle-host measurement (live run got {sps:.0f} on a '
            f'loaded host; the reference keeps its best number)')
    except Exception as e:  # noqa: BLE001 — fall back to the recorded number
        return TF2_MEASURED_FALLBACK, f'recorded measurement (live run failed: {type(e).__name__})'


def last_tpu_record():
    """(record, source) of the most recent TPU bench measurement.

    A chip outage at bench time must not erase the framework's measured
    TPU numbers from the round artifact (round-4 verdict: the CPU-fallback
    0.65x line was regression-shaped noise). Prefers logs/bench_tpu_last.json
    (written by every successful TPU run of this script), else the
    highest-round BENCH_r*.json whose platform was TPU."""
    import glob
    root = os.path.dirname(os.path.abspath(__file__))
    p = os.path.join(root, 'logs', 'bench_tpu_last.json')
    if os.path.exists(p):
        try:
            with open(p) as f:
                return json.load(f), 'logs/bench_tpu_last.json'
        except Exception:  # noqa: BLE001 — fall through to round records
            pass
    best = (None, None)
    for p in glob.glob(os.path.join(root, 'BENCH_r*.json')):
        try:
            with open(p) as f:
                doc = json.load(f)
            rec = doc.get('parsed') or {}
            if not str(rec.get('platform', 'tpu')).startswith('tpu'):
                continue
            if best[0] is None or doc.get('n', 0) > best[0].get('_n', -1):
                best = ({**rec, '_n': doc.get('n', 0)}, os.path.basename(p))
        except Exception:  # noqa: BLE001 — skip unreadable records
            continue
    if best[0] is not None:
        best[0].pop('_n', None)
    return best


def probe_chip(timeout_s: int = 240) -> bool:
    """Bounded liveness probe of the accelerator grant in a THROWAWAY
    subprocess (a hung tunnel would otherwise stall this process's own
    backend init past any deadline we could enforce)."""
    try:
        out = subprocess.run(
            [sys.executable, '-c',
             "import jax; jax.devices(); print('up')"],
            capture_output=True, text=True, timeout=timeout_s)
        return 'up' in out.stdout
    except Exception:  # noqa: BLE001 — any failure means "not usable"
        return False


def main() -> int:
    import jax

    # Graceful degradation: if the TPU tunnel is down (observed multi-hour
    # axon outages), emit an honestly-labeled CPU measurement instead of
    # hanging in backend init and producing no benchmark record at all.
    platform_note = 'tpu'
    if os.environ.get('PGMVAE_BENCH_CPU') or not probe_chip():
        jax.config.update('jax_platforms', 'cpu')
        platform_note = 'cpu (TPU grant unavailable at bench time)'
        print('bench: TPU probe failed -> CPU fallback', file=sys.stderr)
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
    del state, data, m
    gc.collect()

    # ---- large-model configs: the MFU story (VERDICT r2 #2) -------------
    # nltcs above is dispatch-bound (~0.25 MFLOP/sample); these two measure
    # where the FLOPs are. bbc = the tuned flagship recipe's model (real
    # data, guarded default widths); 'bbc bs=250' lifts the batch to fill
    # the MXU (the tuned bs=25 cell sustained 646 samples/sec in round 2);
    # 'ad' is the largest benchmark shape (n=1556; train data stripped from
    # the mount, so samples are synthetic — shapes are what matter here).
    import numpy as np

    from pgmvae_tpu.registry import REGISTRY, default_units

    extras = {}
    if platform_note != 'tpu':
        extras['large_model_skipped'] = ('CPU fallback: the bbc/ad MFU '
                                         'cells are TPU measurements')
        tpu_rec, tpu_src = last_tpu_record()
        if tpu_rec is not None:
            extras['last_tpu_measurement'] = tpu_rec
            extras['last_tpu_source'] = tpu_src
        print(json.dumps({
            'metric': 'stage-1 train throughput (nltcs K=50 D=10 bs=128 EMA)',
            'value': round(samples_per_sec, 1),
            'unit': 'samples/sec/chip',
            'vs_baseline': round(samples_per_sec / baseline_sps, 2),
            'platform': platform_note,
            'nltcs_dispatch_bound_sps': round(samples_per_sec, 1),
            **extras,
        }))
        return 0
    def cell(key, label, *args, **kw):
        # per-cell fault isolation: one OOM must not erase the remaining
        # cells (round-5: the bf16 cell RESOURCE_EXHAUSTED'd and took the
        # rank1 + ad-scale measurements with it). Clear the executable
        # cache after a failure so its reserved buffers are reclaimable.
        import jax
        try:
            extras[key] = bench_model(label, *args, **kw)
        except Exception as e:  # noqa: BLE001 — keep benching
            print(f'{label} failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
            extras[f'{key}_error'] = f'{type(e).__name__}: {e}'[:300]
            jax.clear_caches()
            gc.collect()

    try:
        y_bbc = load_split('bbc', 'train')
        bbc_cfg = VqVaeConfig(
            n_var=1058, units=REGISTRY['bbc'].encoder_units(20), dim=20,
            num_codes=50, cost=0.05, decay=0.9, quantizer='ema',
            dead_code_threshold=0.25, fan_mode='per_network')
        # the recipe behind the RESULTS.md flagship quality row (test PLL
        # -255.648 > the reference's recorded -255.841)
        cell('bbc_quality_recipe', 'bbc quality recipe (bs=25)', bbc_cfg,
             y_bbc, 25, 0.003, 8)
        if 'bbc_quality_recipe' in extras:
            extras['bbc_quality_recipe'] = {
                'identifier': 'bbc_K-50_D-20_bs-25_epk-600_lr-0.003_bta-0.05'
                              '_ema-True_gma-0.9_sd-3-_fm-per_network_dcr-0.25'
                              '_sov-50',
                'pll_test_recorded': -255.648, **extras['bbc_quality_recipe']}
        cell('bbc_throughput_bs250', 'bbc batch-lifted (bs=250)', bbc_cfg,
             y_bbc, 250, 0.003, 16)
        # single-pass fused Adam (--adam-impl fused): the step-anatomy
        # lever — the optimizer update was the dominant step cost
        cell('bbc_bs250_fused_adam', 'bbc bs=250 + fused adam', bbc_cfg,
             y_bbc, 250, 0.003, 16, adam_impl='fused')
        # + bf16 compute (--compute-dtype bf16) + bf16 moments: every
        # network-side HBM stream at half width, optimizer state too
        cell('bbc_bs250_bf16', 'bbc bs=250 + fused_bf16 adam + bf16 compute',
             bbc_cfg._replace(compute_dtype='bf16'), y_bbc,
             250, 0.003, 16, adam_impl='fused_bf16')
        # bs=500: amortizes the batch-independent optimizer HBM traffic
        # (the measured step dominator) over 2x samples — the MFU ceiling.
        # bs=1000 CRASHES the worker (round-5: the [n,B,n] masked
        # activations put the backward peak past the v5e's 16 GB), so this
        # is the largest batch the masked design fits.
        cell('bbc_bs500_bf16', 'bbc bs=500 + fused_bf16 adam + bf16',
             bbc_cfg._replace(compute_dtype='bf16'), y_bbc,
             500, 0.003, 16, adam_impl='fused_bf16')
        # rank-1 first layer: the out-of-memory fallback (measured slower
        # than masked at every fitting shape; docs/design.md)
        cell('bbc_bs250_rank1_fallback', 'bbc bs=250 + rank1 first layer',
             bbc_cfg._replace(first_layer='rank1'), y_bbc, 250, 0.003, 16)
        # rank1 at bs=1000 is the measured MFU record (13.1%, round-5
        # wave-2 anatomy): rank1 never materializes [n,B,n], so it runs a
        # batch the masked design cannot fit, and the batch amortizes the
        # batch-independent optimizer traffic past masked-bs500's 11.8%
        cell('bbc_bs1000_rank1_bf16', 'bbc bs=1000 + rank1 + bf16',
             bbc_cfg._replace(first_layer='rank1', compute_dtype='bf16'),
             y_bbc, 1000, 0.003, 16, adam_impl='fused_bf16')

        rng = np.random.default_rng(0)
        y_ad = rng.integers(0, 2, size=(2461, 1556)).astype(np.float32)
        ad_cfg = VqVaeConfig(n_var=1556, units=default_units(1556, 30),
                             dim=30, num_codes=20, quantizer='ema')
        cell('ad_throughput_bs250', 'ad-scale synthetic (n=1556, bs=250)',
             ad_cfg, y_ad, 250, 0.001, 16)
    except Exception as e:  # noqa: BLE001 — headline metric must still print
        print(f'large-model bench failed: {type(e).__name__}: {e}',
              file=sys.stderr)
        extras['large_model_error'] = f'{type(e).__name__}: {e}'[:300]

    out = {
        'metric': 'stage-1 train throughput (nltcs K=50 D=10 bs=128 EMA)',
        'value': round(samples_per_sec, 1),
        'unit': 'samples/sec/chip',
        'vs_baseline': round(samples_per_sec / baseline_sps, 2),
        'platform': platform_note,
        'nltcs_dispatch_bound_sps': round(samples_per_sec, 1),
        **extras,
    }
    # persist the TPU measurement so a later CPU-fallback run can embed it
    try:
        os.makedirs('logs', exist_ok=True)
        with open('logs/bench_tpu_last.json', 'w') as f:
            json.dump({**out, 'measured_at': time.strftime(
                '%Y-%m-%dT%H:%M:%SZ', time.gmtime())}, f)
    except Exception as e:  # noqa: BLE001 — persistence is best-effort
        print(f'bench: could not persist TPU record: {e}', file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
