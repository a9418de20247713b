#!/bin/bash
# CPU joint-CPT quality chain (runs while the TPU tunnel is down).
# Serial on purpose: JAX-CPU uses every core, so parallel cells just
# contend. Each stage is independent and ||true'd — no gating (the
# round-3 chain lesson). Uses --cpt-parents-eval: one training per
# dataset, stage-2 evaluated at each M post-hoc (bit-identical to
# retrained cptp-M cells when select-on-valid is off).
set -u
cd "$(dirname "$0")/.."
J=logs/cptp-cpu-r4.jsonl
R=logs/cptp-cpu-r4-result.txt

# audio cptp-1 already measured (-39.0786, retrained cell in $J); one more
# training covers the M=0 control + M=2,3
timeout 14400 python run_pipeline.py --joblog $J --result-file $R --device -1 \
    -n audio -k 200 -d 10 -b 100 -e 150 -r 0.001 -c 0.25 -s 4 \
    --cpt-parents-eval 2,3 > logs/cptp-cpu-audio.out 2>&1 || true
timeout 14400 python run_pipeline.py --joblog $J --result-file $R --device -1 \
    -n jester -k 100 -d 30 -b 100 -e 150 -r 0.001 -c 0.25 -s 1 \
    --cpt-parents-eval 1,2,3 > logs/cptp-cpu-jester.out 2>&1 || true
echo "cptp cpu chain done: $(date -u +%H:%M:%S)"
