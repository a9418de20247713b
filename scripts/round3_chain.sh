#!/bin/bash
# Round-3 TPU work queue (VERDICT r2 next-round items 1, 5, 6, 7).
#
# Waits for the regen campaign (scripts/regen_tuned.sh, /tmp/regen3.pid) to
# drain the chip, then runs, in priority order:
#   1. regen report (winners by valid PLL -> logs/regen-r3-report.md)
#   2. CMLL rerun on the REGENERATED tuned bests (integrity of the headline)
#   3. the reference's shipped kdd K=4096 grid on synthetic kdd-shaped data
#   4. out-of-core streaming fit > 4 GiB
#   5. joint-code CPT campaign (cheapest datasets first; students last)
# Each step is bounded by timeout and logged; a crash moves on to the next.
set -u
cd "$(dirname "$0")/.."

if [ -f /tmp/regen3.pid ]; then
  while kill -0 "$(cat /tmp/regen3.pid)" 2>/dev/null; do sleep 60; done
fi
echo "== chip free: $(date -u +%H:%M:%S) =="

python scripts/regen_report.py logs/regen-r3.jsonl --all \
    > logs/regen-r3-report.md 2>logs/regen-r3-report.err || true
echo "== regen report done =="

timeout 7200 python scripts/run_cmll_all.py --force \
    --from-regen logs/regen-r3.jsonl \
    --only netflix,accidents,plants,pumsb_star,50-17-8,students_03_02-0000 \
    >> logs/cmll-r3-rerun.out 2>&1 || true
echo "== cmll rerun done =="

timeout 1800 python scripts/bench_packed.py \
    >> logs/bench_packed.out 2>&1 || true
echo "== packed-seed bench done =="

timeout 9000 python run_pipeline.py --joblog logs/kdd-r3.jsonl \
    --result-file logs/kdd-r3-result.txt -m --isolate --cell-timeout 3600 \
    -n kdd -k 4096 -d 10 -b 32 -e 200 -r 2e-4 \
    -c 0.35,0.4,0.45,0.5 -s 5 --data-dir /tmp/synth_trw \
    >> logs/kdd-r3.out 2>&1 || true
echo "== kdd K=4096 grid done =="

timeout 5400 python scripts/bench_streaming.py \
    >> logs/bench_streaming.out 2>&1 || true
echo "== streaming bench done =="

python scripts/cptp_campaign.py \
    --only accidents,pumsb_star,50-17-8,students_03_02-0000 \
    >> logs/cptp-r3.out 2>&1 || true
echo "== cptp campaign done =="

timeout 3600 python bench.py >> logs/bench_r3_preflight.out 2>&1 || true
echo "== bench.py preflight done =="
echo "round3 chain complete: $(date -u +%H:%M:%S)"
