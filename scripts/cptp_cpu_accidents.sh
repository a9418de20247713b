#!/bin/bash
# CPU insurance for the joint-CPT campaign's biggest-gap target that is
# still CPU-feasible: accidents at the regen-winner recipe (sd-2, dcr-0.1,
# sov-40), UNPACKED (a pk-3 lane would triple CPU cost; the unpacked
# trajectory is a different — identifier-distinct — cell, and the lever
# delta (cpe-M vs primary) is what this measures). Waits for the audio/
# jester chain to free the cores. The TPU campaign covers the packed
# winners if the chip returns.
set -u
cd "$(dirname "$0")/.."
while [ -f /tmp/cptp_chain.pid ] && kill -0 "$(cat /tmp/cptp_chain.pid)" \
    2>/dev/null; do sleep 60; done
timeout 25000 python run_pipeline.py --joblog logs/cptp-cpu-r4.jsonl \
    --result-file logs/cptp-cpu-r4-result.txt --device -1 \
    -n accidents -k 500 -d 30 -b 128 -e 200 -r 0.003 -c 0.25 -m -g 0.99 \
    --dead-code-threshold 0.1 --select-on-valid 40 -s 2 \
    --cpt-parents-eval 1,2,3 > logs/cptp-cpu-accidents.out 2>&1 || true
echo "accidents cpu cell done: $(date -u +%H:%M:%S)"
