#!/bin/bash
# Round-4 TPU queue (VERDICT r3 next-round items). One chip, so jobs run
# sequentially — but each is independent, starts immediately after the
# previous, writes its own log, and NEVER gates on a pid file (the round-3
# chain lost five deliverables blocking on one). `|| true` everywhere: a
# failed job must not dam the queue.
#
# Usage: scripts/round4_tpu_queue.sh [stage...]   (default: all stages)
set -u
cd "$(dirname "$0")/.."
# Round 5: the chip never returned during round 4, so the still-running
# chip_watcher.sh (which cannot be safely edited while executing) points
# here. Delegate default invocations to the round-5 queue, whose bench-first
# ordering secures a TPU BENCH number before anything long-running starts.
if [ $# -eq 0 ] && [ -f scripts/round5_tpu_queue.sh ]; then
  exec bash scripts/round5_tpu_queue.sh
fi
# cheap/high-value first: probe (MFU decision) and bbc250 (quality-at-speed)
# are ~30 min each; cptp is the remaining quality lever; the rest follow.
STAGES=${@:-probe bbc250 cptp kdd students_cmll streaming bench}

log() { echo "== $1: $(date -u +%H:%M:%S) ==" | tee -a logs/round4_queue.out; }

for st in $STAGES; do
  case $st in
    probe)
      # fused-Adam decision measurement (scripts/bench_adam_probe.py)
      log "adam probe start"
      timeout 2400 python scripts/bench_adam_probe.py \
          > logs/adam_probe_r4.out 2>&1 || true
      log "adam probe done"
      # step anatomy at bbc scale for each optimizer/dtype combination
      log "anatomy sweep start"
      timeout 1800 python scripts/bench_step_anatomy.py \
          > logs/anatomy_optax_r4.out 2>&1 || true
      timeout 1800 python scripts/bench_step_anatomy.py --adam-impl fused \
          > logs/anatomy_fused.out 2>&1 || true
      timeout 1800 python scripts/bench_step_anatomy.py \
          --adam-impl fused_bf16 --compute-dtype bf16 \
          > logs/anatomy_bf16.out 2>&1 || true
      # MFU ceiling: bs=1000 amortizes the Adam HBM traffic (the measured
      # step dominator: 6.67 GB/step regardless of batch) over 4x samples
      timeout 1800 python scripts/bench_step_anatomy.py --batch 1000 \
          --adam-impl fused_bf16 --compute-dtype bf16 \
          > logs/anatomy_bf16_bs1000.out 2>&1 || true
      log "anatomy sweep done"
      ;;
    kdd)
      # the one cell the round-end kill took (rc=-15); resume from joblog
      log "kdd retry start"
      timeout 3600 python scripts/synth_kdd.py 2>/dev/null || true
      timeout 7200 python run_pipeline.py --joblog logs/kdd-r3.jsonl \
          --result-file logs/kdd-r3-result.txt --retry-failed -m --isolate \
          --cell-timeout 3600 -n kdd -k 4096 -d 10 -b 32 -e 200 -r 0.0002 \
          -c 0.35,0.4,0.45,0.5 -g 0.99 -s 5 --vq-impl auto \
          >> logs/kdd-r3.out 2>&1 || true
      log "kdd retry done"
      ;;
    cptp)
      # joint-code CPT quality campaign over the regen winners
      log "cptp campaign start"
      timeout 28800 python scripts/cptp_campaign.py \
          > logs/cptp-r4.out 2>&1 || true
      # small datasets at their tuned recipes (CPU pilot showed nltcs
      # -5.263 -> -5.056 with M=0..3; these record the TPU trajectories)
      # post-hoc eval mode: one training per dataset, stage-2 at M=1..3
      # (cpe-M records; with no select-on-valid these are bit-identical to
      # retrained cptp-M cells — tests/test_cpt_parents.py)
      timeout 3600 python run_pipeline.py --joblog logs/cptp-small-r4.jsonl \
          --result-file logs/cptp-small-r4-result.txt \
          -n nltcs -k 100 -d 10 -b 128 -e 100 -r 0.003 -c 0.25 -s 1 \
          --cpt-parents-eval 1,2,3 > logs/cptp-small-nltcs.out 2>&1 || true
      timeout 3600 python run_pipeline.py --joblog logs/cptp-small-r4.jsonl \
          --result-file logs/cptp-small-r4-result.txt \
          -n bn2o-30-20-200-2a -k 50 -d 30 -b 128 -e 100 -r 0.003 -c 0.25 \
          -s 1 --cpt-parents-eval 1,2,3 > logs/cptp-small-bn2o.out 2>&1 || true
      # dna on TPU: the CPU headline (M=3 -59.40 vs M=0 -100.38) re-measured
      # on the chip at the same recipe
      timeout 7200 python run_pipeline.py --joblog logs/cptp-small-r4.jsonl \
          --result-file logs/cptp-small-r4-result.txt \
          -n dna -k 200 -d 10 -b 100 -e 300 -r 0.001 -c 0.1 -s 4 \
          --cpt-parents-eval 1,2,3,4 > logs/cptp-small-dna.out 2>&1 || true
      # regenerate the winner report from all campaign joblogs
      timeout 300 python scripts/cptp_report.py \
          > logs/cptp-report.out 2>&1 || true
      log "cptp campaign done"
      ;;
    students_cmll)
      # honest CMLL for the pk-3 students winner: rebuild the exact packed
      # program (seeds 1,2,3) with --cmll; seed 1 is the tuned-table row
      log "students packed cmll start"
      timeout 14400 python run_pipeline.py \
          --joblog logs/students-pk3-cmll.jsonl \
          --result-file logs/students-pk3-cmll-result.txt \
          --pack-seeds 3 -m --isolate --cell-timeout 10800 \
          -n students_03_02-0000 -k 500 -d 30 -b 32 -e 600 -r 0.001 \
          -c 0.25 -g 0.99 --dead-code-threshold 0.1 --select-on-valid 100 \
          -s 1,2,3 --cmll \
          > logs/students-pk3-cmll.out 2>&1 || true
      log "students packed cmll done"
      ;;
    streaming)
      # the >4 GiB out-of-core fit (reference run.py:53 TODO)
      log "streaming bench start"
      timeout 10800 python scripts/bench_streaming.py \
          > logs/bench_streaming.out 2>&1 || true
      log "streaming bench done"
      ;;
    bbc250)
      # perf-quality gap: can bs=250 hold the bs=25 quality?
      log "bbc bs250 quality sweep start"
      bash scripts/bbc_bs250_quality.sh \
          > logs/bbc-bs250-r4.out 2>&1 || true
      log "bbc bs250 quality sweep done"
      ;;
    bench)
      # our own record of the round-4 bench (incl. fused-adam + bf16 cells)
      log "bench start"
      timeout 3600 python bench.py > logs/bench_r4.out 2>&1 || true
      log "bench done"
      ;;
    *) echo "unknown stage: $st" ;;
  esac
done
log "queue finished"
