#!/bin/bash
# Round-3 tuned-table regeneration (VERDICT r2, next-round #1).
#
# The 6 round-1 tuned cells whose identifiers aliased the dead-code-restart
# threshold into a freeform note (netflix, accidents, plants, pumsb_star,
# 50-17-8, students) are re-swept here with the threshold EXPLICIT in the
# identifier: --dead-code-threshold {0.1,0.25,0.5,1.0} x 3 seeds around the
# recorded hypers, best cell selected on VALID PLL (reported on test).
# Every resulting identifier regenerates its number by construction.
#
# Seeds are packed 3-per-device-program (--pack-seeds); the joblog makes the
# campaign resumable after a TPU-worker crash.
set -u
cd "$(dirname "$0")/.."
JOBLOG=${JOBLOG:-logs/regen-r3.jsonl}
RESULT=${RESULT:-logs/regen-r3-result.txt}
DCR=${DCR:-0.1,0.25,0.5,1.0}
SEEDS=${SEEDS:-1,2,3}

run() {
  timeout 21600 python run_pipeline.py --joblog "$JOBLOG" \
      --result-file "$RESULT" --pack-seeds 3 -m --isolate \
      --cell-timeout 7200 \
      --dead-code-threshold "$DCR" -s "$SEEDS" "$@" || true
}

# cheapest first: a crash late loses the least coverage
run -n plants     -k 500 -d 30 -b 256 -e 150 -r 0.003 --select-on-valid 30
run -n accidents  -k 500 -d 30 -b 128 -e 200 -r 0.003 --select-on-valid 40
run -n netflix    -k 500 -d 10 -b 128 -e 300 -r 0.001 --select-on-valid 50
run -n pumsb_star -k 200 -d 30 -b 64  -e 200 -r 0.001 --select-on-valid 40
run -n 50-17-8    -k 500 -d 30 -b 64  -e 300 -r 0.001 --select-on-valid 50
run -n students_03_02-0000 \
    -k 500 -d 30 -b 32 -e 600 -r 0.001 --select-on-valid 100
echo "regen campaign done; joblog=$JOBLOG"
