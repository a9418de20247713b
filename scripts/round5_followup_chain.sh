#!/bin/bash
# Round-5 follow-up chain: runs AFTER scripts/round5_manual_chain.sh
# (students cptp_small gap cmll_winners kdd bench report) releases the
# chip. Same probe-between-stages discipline (the worker restarts under
# OOM faults; a stale grant wedges a fresh process at backend init).
#
#   students_hiM  — the 5-seed campaign showed test PLL still improving
#                   at M=4 (-12.1/-9.7/-8.2/-6.98 for M=1..4, seed 1);
#                   evaluate M=5..8 post-hoc at the same recipe to find
#                   the elbow. Tables stay small: [376, 500, 2^8].
#   wave2         — MFU-ceiling anatomy cells the bs=1000 crash displaced
#                   (bs=500 masked bf16; bs=1000 rank1 bf16).
#   cptp_more     — netflix/plants joint-CPT cells (VERDICT r4 #3).
#   students_cmll_m4 — CMLL at the students joint-CPT winner (M=4):
#                   sanity-tracks the -6.98 PLL claim with the
#                   reference's own eval (core/model.py:110-148 analogue).
#   bench         — refresh logs/bench_tpu_last.json with every cell.
#   report        — regenerate the joint-CPT winner table.
#
# Usage: scripts/round5_followup_chain.sh [stage...]   (default: all)
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
  STAGES=(students_hiM wave2 cptp_more students_cmll_m4 bench report)
fi

for st in "${STAGES[@]}"; do
  probe || true
  case $st in
    students_hiM)
      log "students hi-M start"
      timeout 7200 python run_pipeline.py \
          --joblog logs/cptp-students-hiM.jsonl \
          --result-file logs/cptp-students-hiM-result.txt \
          -n students_03_02-0000 -k 500 -d 30 -b 32 -e 600 -r 0.001 \
          -c 0.25 -m -g 0.99 --dead-code-threshold 0.1 \
          --select-on-valid 100 -s 1 --cpt-parents-eval 5,6,7,8 \
          > logs/cptp-students-hiM.out 2>&1 || true
      log "students hi-M done"
      ;;
    wave2)
      bash scripts/round5_anatomy_wave2.sh || true
      ;;
    cptp_more)
      bash scripts/round5_manual_chain.sh cptp_more || true
      ;;
    students_cmll_m4)
      log "students cmll m4 start"
      timeout 10800 python run_pipeline.py \
          --joblog logs/cptp-cmll-r5.jsonl \
          --result-file logs/cptp-cmll-r5-result.txt \
          -n students_03_02-0000 -k 500 -d 30 -b 32 -e 600 -r 0.001 \
          -c 0.25 -m -g 0.99 --dead-code-threshold 0.1 \
          --select-on-valid 100 -s 1 --cpt-parents 4 --cmll \
          > logs/cptp-cmll-students.out 2>&1 || true
      log "students cmll m4 done"
      ;;
    bench)
      log "followup bench start"
      timeout 3600 python bench.py > logs/bench_r5b.out 2>&1 || true
      log "followup bench done"
      ;;
    report)
      timeout 300 python scripts/cptp_report.py \
          > logs/cptp-report.out 2>&1 || true
      log "cptp report regenerated"
      ;;
    *) echo "unknown stage: $st" ;;
  esac
done
log "followup chain finished: ${STAGES[*]}"
