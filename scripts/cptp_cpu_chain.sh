#!/bin/bash
# CPU joint-CPT quality chain (runs while the TPU tunnel is down).
# Serial on purpose: JAX-CPU uses every core, so parallel cells just
# contend. Each stage is independent and ||true'd — no gating (the
# round-3 chain lesson).
set -u
cd "$(dirname "$0")/.."
J=logs/cptp-cpu-r4.jsonl
R=logs/cptp-cpu-r4-result.txt

# wait for the in-flight cptp run (pid file) to drain — same joblog
while [ -f /tmp/cptp_cpu.pid ] && kill -0 "$(cat /tmp/cptp_cpu.pid)" \
    2>/dev/null; do sleep 60; done

timeout 14400 python run_pipeline.py --joblog $J --result-file $R --device -1 \
    -n audio -k 200 -d 10 -b 100 -e 150 -r 0.001 -c 0.25 -s 4 \
    --cpt-parents 1,2,3 > logs/cptp-cpu-audio.out 2>&1 || true
timeout 14400 python run_pipeline.py --joblog $J --result-file $R --device -1 \
    -n jester -k 100 -d 30 -b 100 -e 150 -r 0.001 -c 0.25 -s 1 \
    --cpt-parents 1,2,3 > logs/cptp-cpu-jester.out 2>&1 || true
echo "cptp cpu chain done: $(date -u +%H:%M:%S)"
