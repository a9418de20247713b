#!/bin/bash
# CPU insurance, wave 2 of the joint-CPT quality campaign: the two
# remaining paper-gap datasets that are CPU-feasible — pumsb_star
# (~2.5-3.5h) and 50-17-8 (~5-7h) at their regen-winner recipes
# (RESULTS.md tuned rows), UNPACKED single winner seed (a pk-3 lane
# would triple CPU cost; the lever delta cpe-M vs primary is what this
# measures). students (376 vars x 600 epochs, ~20h CPU) is TPU-only —
# covered by scripts/cptp_campaign.py in the round-4 TPU queue.
# Waits for the accidents insurance cell to free the cores. ||true'd,
# never pid-file-gated beyond the single upstream waiter.
set -u
cd "$(dirname "$0")/.."
while [ -f /tmp/cptp_acc.pid ] && kill -0 "$(cat /tmp/cptp_acc.pid)" \
    2>/dev/null; do sleep 60; done
J=logs/cptp-cpu-r4.jsonl
R=logs/cptp-cpu-r4-result.txt
timeout 18000 python run_pipeline.py --joblog $J --result-file $R \
    --device -1 \
    -n pumsb_star -k 200 -d 30 -b 64 -e 200 -r 0.001 -c 0.25 -m -g 0.99 \
    --dead-code-threshold 0.1 --select-on-valid 40 -s 2 \
    --cpt-parents-eval 1,2,3 > logs/cptp-cpu-pumsb.out 2>&1 || true
timeout 32000 python run_pipeline.py --joblog $J --result-file $R \
    --device -1 \
    -n 50-17-8 -k 500 -d 30 -b 64 -e 300 -r 0.001 -c 0.25 -m -g 0.99 \
    --dead-code-threshold 0.1 --select-on-valid 50 -s 3 \
    --cpt-parents-eval 1,2,3 > logs/cptp-cpu-50178.out 2>&1 || true
echo "gap2 cpu cells done: $(date -u +%H:%M:%S)"
