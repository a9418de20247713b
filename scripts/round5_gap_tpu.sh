#!/bin/bash
# Round-5 gap-dataset joint-CPT cells on TPU (VERDICT r4 #3). The round-4
# CPU insurance cells (scripts/cptp_cpu_accidents.sh, cptp_cpu_gap2.sh)
# died with the round-end kill and this machine now has ONE host core, so
# CPU retraining is off the table — these are the SAME recipes (regen-r3
# winners, unpacked single winner seed, --cpt-parents-eval post-hoc sweep)
# minus `--device -1`, so each identifier differs from its CPU twin only
# by recorded platform. ||true'd, timeout-bounded, never pid-gated.
#
# Usage: scripts/round5_gap_tpu.sh   (run when the chip is free)
set -u
cd "$(dirname "$0")/.."
J=logs/cptp-gap-r5.jsonl
R=logs/cptp-gap-r5-result.txt

log() { echo "== $1: $(date -u +%H:%M:%S) ==" | tee -a logs/round5_queue.out; }

log "gap cptp accidents start"
timeout 7200 python run_pipeline.py --joblog $J --result-file $R \
    -n accidents -k 500 -d 30 -b 128 -e 200 -r 0.003 -c 0.25 -m -g 0.99 \
    --dead-code-threshold 0.1 --select-on-valid 40 -s 2 \
    --cpt-parents-eval 1,2,3 > logs/cptp-gap-accidents.out 2>&1 || true
log "gap cptp pumsb_star start"
timeout 7200 python run_pipeline.py --joblog $J --result-file $R \
    -n pumsb_star -k 200 -d 30 -b 64 -e 200 -r 0.001 -c 0.25 -m -g 0.99 \
    --dead-code-threshold 0.1 --select-on-valid 40 -s 2 \
    --cpt-parents-eval 1,2,3 > logs/cptp-gap-pumsb.out 2>&1 || true
log "gap cptp 50-17-8 start"
timeout 10800 python run_pipeline.py --joblog $J --result-file $R \
    -n 50-17-8 -k 500 -d 30 -b 64 -e 300 -r 0.001 -c 0.25 -m -g 0.99 \
    --dead-code-threshold 0.1 --select-on-valid 50 -s 3 \
    --cpt-parents-eval 1,2,3 > logs/cptp-gap-50178.out 2>&1 || true
timeout 300 python scripts/cptp_report.py > logs/cptp-report.out 2>&1 || true
log "gap cptp done"
