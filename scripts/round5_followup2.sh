#!/bin/bash
# Round-5 follow-up chain 2: runs AFTER scripts/round5_followup_chain.sh
# releases the chip. Chases the two still-monotone parent-count curves
# with the new scatter-add counting path (stage2.py:SCATTER_COLS, M cap
# 12), demos --cpt-parents-mix on the elbowed gap datasets, and reruns
# the anomalous wave-2 anatomy cell.
#
#   students_hiM2 — students at the campaign recipe (sd-1), the FULL
#                   candidate ladder M=1..12 plus the mixed record.
#                   M=9..12 only became feasible with the scatter path
#                   (the one-hot at M=10 is 24 GB; the count buffers at
#                   M=12 are 6.2 GB, just under the byte guard).
#   fifty_hiM2    — 50-17-8 (already BEATS paper at M=5) extended to
#                   M=7..10 + mix at the same recipe/seed.
#   mix_gap       — accidents (elbow M=2), pumsb_star (elbow M=4),
#                   plants (elbow M=2, 0.02 nats from paper) and netflix
#                   (elbow M=1, 0.01 short of tuned): per-variable mixing
#                   across the elbow recovers each variable's own best M —
#                   plants only needs a hair to beat its paper baseline.
#   anatomy_rerun — the masked bs=500 fused_bf16 cell measured 611 ms/step
#                   seconds after a worker restart (logs/
#                   anatomy_bf16_bs500.out); rerun on a warm chip.
#   bench, report — refresh logs/bench_tpu_last.json + the winner table.
#
# Usage: scripts/round5_followup2.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."

log() { echo "== $1: $(date -u +%H:%M:%S) ==" | tee -a logs/round5_queue.out; }

probe() {
  for i in $(seq 1 20); do
    if timeout 240 python -c "import jax; jax.devices(); \
import jax.numpy as j; j.ones(2).sum().block_until_ready(); print('up')" \
        2>/dev/null | grep -q up; then return 0; fi
    log "chip probe $i failed; waiting"
    sleep 60
  done
  log "chip unreachable after 20 probes"
  return 1
}

STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(students_hiM2 fifty_hiM2 mix_gap anatomy_rerun bench report)
fi

# Same round-end discipline as chain 1: past the deadline only the cheap
# bench+report refresh may touch the chip (the driver's round-end bench
# must not find it held).
DEADLINE_UTC=${DEADLINE_UTC:-2115}
past_deadline() { [ "$(date -u +%H%M)" -ge "$DEADLINE_UTC" ]; }

for st in "${STAGES[@]}"; do
  if past_deadline && [ "$st" != bench ] && [ "$st" != report ]; then
    log "skip $st (past deadline $DEADLINE_UTC)"
    continue
  fi
  probe || true
  case $st in
    students_hiM2)
      log "students hiM2+mix start"
      timeout 10800 python run_pipeline.py \
          --joblog logs/cptp-students-hiM2.jsonl \
          --result-file logs/cptp-students-hiM2-result.txt \
          -n students_03_02-0000 -k 500 -d 30 -b 32 -e 600 -r 0.001 \
          -c 0.25 -m -g 0.99 --dead-code-threshold 0.1 \
          --select-on-valid 100 -s 1 \
          --cpt-parents-eval 1,2,3,4,5,6,7,8,9,10,11,12 \
          --cpt-parents-mix \
          > logs/cptp-students-hiM2.out 2>&1 || true
      log "students hiM2+mix done"
      ;;
    fifty_hiM2)
      log "50-17-8 hiM2+mix start"
      timeout 10800 python run_pipeline.py \
          --joblog logs/cptp-gap-hiM2.jsonl \
          --result-file logs/cptp-gap-hiM2-result.txt \
          -n 50-17-8 -k 500 -d 30 -b 64 -e 300 -r 0.001 -c 0.25 -m \
          -g 0.99 --dead-code-threshold 0.1 --select-on-valid 50 -s 3 \
          --cpt-parents-eval 4,5,6,7,8,9,10 --cpt-parents-mix \
          > logs/cptp-gap-hiM2.out 2>&1 || true
      log "50-17-8 hiM2+mix done"
      ;;
    mix_gap)
      log "mix accidents/pumsb_star start"
      timeout 7200 python run_pipeline.py \
          --joblog logs/cptp-mix-gap.jsonl \
          --result-file logs/cptp-mix-gap-result.txt \
          -n accidents -k 500 -d 30 -b 128 -e 200 -r 0.003 -c 0.25 -m \
          -g 0.99 --dead-code-threshold 0.1 --select-on-valid 40 -s 2 \
          --cpt-parents-eval 1,2,3 --cpt-parents-mix \
          > logs/cptp-mix-gap.out 2>&1 || true
      timeout 7200 python run_pipeline.py \
          --joblog logs/cptp-mix-gap.jsonl \
          --result-file logs/cptp-mix-gap-result.txt \
          -n pumsb_star -k 200 -d 30 -b 64 -e 200 -r 0.001 -c 0.25 -m \
          -g 0.99 --dead-code-threshold 0.1 --select-on-valid 40 -s 2 \
          --cpt-parents-eval 3,4,5 --cpt-parents-mix \
          >> logs/cptp-mix-gap.out 2>&1 || true
      timeout 7200 python run_pipeline.py \
          --joblog logs/cptp-mix-gap.jsonl \
          --result-file logs/cptp-mix-gap-result.txt \
          -n plants -k 500 -d 30 -b 256 -e 150 -r 0.003 -c 0.25 -m \
          -g 0.99 --dead-code-threshold 0.1 --select-on-valid 30 -s 2 \
          --cpt-parents-eval 1,2,3 --cpt-parents-mix \
          >> logs/cptp-mix-gap.out 2>&1 || true
      timeout 7200 python run_pipeline.py \
          --joblog logs/cptp-mix-gap.jsonl \
          --result-file logs/cptp-mix-gap-result.txt \
          -n netflix -k 500 -d 10 -b 128 -e 300 -r 0.001 -c 0.25 -m \
          -g 0.99 --dead-code-threshold 0.1 --select-on-valid 50 -s 1 \
          --cpt-parents-eval 1,2,3 --cpt-parents-mix \
          >> logs/cptp-mix-gap.out 2>&1 || true
      log "mix gap datasets done"
      ;;
    anatomy_rerun)
      log "anatomy bs500 rerun start"
      timeout 1800 python scripts/bench_step_anatomy.py --batch 500 \
          --adam-impl fused_bf16 --compute-dtype bf16 \
          > logs/anatomy_bf16_bs500_rerun.out 2>&1 || true
      log "anatomy bs500 rerun done"
      ;;
    bench)
      log "followup2 bench start"
      timeout 3600 python bench.py > logs/bench_r5c.out 2>&1 || true
      log "followup2 bench done"
      ;;
    report)
      timeout 300 python scripts/cptp_report.py \
          > logs/cptp-report.out 2>&1 || true
      log "cptp report regenerated"
      ;;
    *) echo "unknown stage: $st" ;;
  esac
done
log "followup2 chain finished: ${STAGES[*]}"
