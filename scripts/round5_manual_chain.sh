#!/bin/bash
# Round-5 manual stage chain. Replaces the wedged round5_tpu_queue.sh run:
# the bs=1000 anatomy cell crashed the TPU worker and the next stage's
# process wedged silently at backend init on the stale grant. Between
# stages this runner PROBES the chip with a bounded jax.devices() call and
# only proceeds once a fresh process can actually acquire the grant —
# absorbing worker restarts instead of wedging on them.
#
# Usage: scripts/round5_manual_chain.sh stage [stage...]
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

for st in "$@"; do
  probe || true
  case $st in
    students)
      log "cptp students start"
      timeout 21600 python run_pipeline.py \
          --joblog logs/cptp-students-r5.jsonl \
          --result-file logs/cptp-students-r5-result.txt \
          -n students_03_02-0000 -k 500 -d 30 -b 32 -e 600 -r 0.001 \
          -c 0.25 -m -g 0.99 --dead-code-threshold 0.1 \
          --select-on-valid 100 -s 1,2,3,4,5 --cpt-parents-eval 1,2,3,4 \
          > logs/cptp-students-r5.out 2>&1 || true
      log "cptp students done"
      ;;
    cptp_small)
      log "cptp small start"
      timeout 3600 python run_pipeline.py --joblog logs/cptp-small-r4.jsonl \
          --result-file logs/cptp-small-r4-result.txt \
          -n nltcs -k 100 -d 10 -b 128 -e 100 -r 0.003 -c 0.25 -s 1 \
          --cpt-parents-eval 1,2,3 > logs/cptp-small-nltcs.out 2>&1 || true
      timeout 3600 python run_pipeline.py --joblog logs/cptp-small-r4.jsonl \
          --result-file logs/cptp-small-r4-result.txt \
          -n bn2o-30-20-200-2a -k 50 -d 30 -b 128 -e 100 -r 0.003 -c 0.25 \
          -s 1 --cpt-parents-eval 1,2,3 > logs/cptp-small-bn2o.out 2>&1 || true
      timeout 7200 python run_pipeline.py --joblog logs/cptp-small-r4.jsonl \
          --result-file logs/cptp-small-r4-result.txt \
          -n dna -k 200 -d 10 -b 100 -e 300 -r 0.001 -c 0.1 -s 4 \
          --cpt-parents-eval 1,2,3,4 > logs/cptp-small-dna.out 2>&1 || true
      log "cptp small done"
      ;;
    gap)
      bash scripts/round5_gap_tpu.sh || true
      ;;
    cmll_winners)
      log "cmll winners start"
      timeout 7200 python run_pipeline.py --joblog logs/cptp-cmll-r5.jsonl \
          --result-file logs/cptp-cmll-r5-result.txt \
          -n nltcs -k 100 -d 10 -b 128 -e 100 -r 0.003 -c 0.25 -s 1 \
          --cpt-parents 3 --cmll > logs/cptp-cmll-nltcs.out 2>&1 || true
      timeout 7200 python run_pipeline.py --joblog logs/cptp-cmll-r5.jsonl \
          --result-file logs/cptp-cmll-r5-result.txt \
          -n bn2o-30-20-200-2a -k 50 -d 30 -b 128 -e 100 -r 0.003 -c 0.25 \
          -s 1 --cpt-parents 2 --cmll > logs/cptp-cmll-bn2o.out 2>&1 || true
      timeout 10800 python run_pipeline.py --joblog logs/cptp-cmll-r5.jsonl \
          --result-file logs/cptp-cmll-r5-result.txt \
          -n audio -k 200 -d 10 -b 100 -e 150 -r 0.001 -c 0.25 -s 4 \
          --cpt-parents 1 --cmll > logs/cptp-cmll-audio.out 2>&1 || true
      timeout 10800 python run_pipeline.py --joblog logs/cptp-cmll-r5.jsonl \
          --result-file logs/cptp-cmll-r5-result.txt \
          -n jester -k 100 -d 30 -b 100 -e 150 -r 0.001 -c 0.25 -s 1 \
          --cpt-parents 1 --cmll > logs/cptp-cmll-jester.out 2>&1 || true
      log "cmll winners done"
      ;;
    kdd)
      log "kdd retry start"
      timeout 3600 python scripts/synth_kdd.py 2>/dev/null || true
      timeout 7200 python run_pipeline.py --joblog logs/kdd-r3.jsonl \
          --result-file logs/kdd-r3-result.txt --retry-failed -m --isolate \
          --cell-timeout 3600 -n kdd -k 4096 -d 10 -b 32 -e 200 -r 0.0002 \
          -c 0.35,0.4,0.45,0.5 -g 0.99 -s 5 --vq-impl auto \
          >> logs/kdd-r3.out 2>&1 || true
      log "kdd retry done"
      ;;
    bench)
      log "bench start"
      timeout 3600 python bench.py > logs/bench_r5.out 2>&1 || true
      log "bench done"
      ;;
    report)
      timeout 300 python scripts/cptp_report.py \
          > logs/cptp-report.out 2>&1 || true
      log "cptp report regenerated"
      ;;
    cptp_more)
      log "cptp netflix/plants start"
      timeout 10800 python run_pipeline.py --joblog logs/cptp-cpu-r4.jsonl \
          --result-file logs/cptp-cpu-r4-result.txt \
          -n netflix -k 500 -d 10 -b 128 -e 300 -r 0.001 -c 0.25 -m -g 0.99 \
          --dead-code-threshold 0.1 --select-on-valid 50 -s 1 \
          --cpt-parents-eval 1,2,3 > logs/cptp-netflix.out 2>&1 || true
      timeout 7200 python run_pipeline.py --joblog logs/cptp-cpu-r4.jsonl \
          --result-file logs/cptp-cpu-r4-result.txt \
          -n plants -k 500 -d 30 -b 256 -e 150 -r 0.003 -c 0.25 -m -g 0.99 \
          --dead-code-threshold 0.1 --select-on-valid 30 -s 2 \
          --cpt-parents-eval 1,2,3 > logs/cptp-plants.out 2>&1 || true
      log "cptp netflix/plants done"
      ;;
    students_cmll)
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
    bbc250)
      log "bbc bs250 quality sweep start"
      bash scripts/bbc_bs250_quality.sh \
          > logs/bbc-bs250-r4.out 2>&1 || true
      log "bbc bs250 quality sweep done"
      ;;
    streaming)
      log "streaming bench start"
      timeout 10800 python scripts/bench_streaming.py \
          > logs/bench_streaming.out 2>&1 || true
      log "streaming bench done"
      ;;
    *) echo "unknown stage: $st" ;;
  esac
done
log "manual chain finished: $*"
