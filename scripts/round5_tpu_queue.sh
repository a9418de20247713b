#!/bin/bash
# Round-5 TPU queue (VERDICT r4 next-round items). Fired by
# scripts/chip_watcher.sh (via round4_tpu_queue.sh) the moment the axon
# grant returns, or manually. BENCH-FIRST ordering: the round-4 queue put
# bench last and the chip never came back, so the round shipped a CPU
# fallback number — the first ~20 min of silicon now secure BENCH material
# (logs/bench_tpu_last.json) before anything long-running starts.
#
# Jobs run sequentially (one chip), each `|| true`d and timeout-bounded: a
# failed job must not dam the queue.
#
# Usage: scripts/round5_tpu_queue.sh [stage...]   (default: all stages)
set -u
cd "$(dirname "$0")/.."
STAGES=${@:-bench probe cptp_students cptp_small cptp_more cmll_winners kdd students_cmll bbc250 streaming}

log() { echo "== $1: $(date -u +%H:%M:%S) ==" | tee -a logs/round5_queue.out; }

for st in $STAGES; do
  case $st in
    bench)
      # VERDICT r4 #1: BENCH_r05 must be a TPU number. bench.py persists
      # logs/bench_tpu_last.json so even a later outage keeps the record.
      log "bench start"
      timeout 3600 python bench.py > logs/bench_r5.out 2>&1 || true
      log "bench done"
      ;;
    probe)
      # VERDICT r4 #2: prove (or kill) the MFU climb — fused Adam + bf16 +
      # bs=1000 anatomy at bbc scale, vs the 36.65 ms / 6.9% MFU optax step.
      log "adam probe start"
      timeout 2400 python scripts/bench_adam_probe.py \
          > logs/adam_probe_r4.out 2>&1 || true
      log "anatomy sweep start"
      timeout 1800 python scripts/bench_step_anatomy.py \
          > logs/anatomy_optax_r4.out 2>&1 || true
      timeout 1800 python scripts/bench_step_anatomy.py --adam-impl fused \
          > logs/anatomy_fused.out 2>&1 || true
      timeout 1800 python scripts/bench_step_anatomy.py \
          --adam-impl fused_bf16 --compute-dtype bf16 \
          > logs/anatomy_bf16.out 2>&1 || true
      timeout 1800 python scripts/bench_step_anatomy.py --batch 1000 \
          --adam-impl fused_bf16 --compute-dtype bf16 \
          > logs/anatomy_bf16_bs1000.out 2>&1 || true
      log "anatomy sweep done"
      ;;
    cptp_students)
      # VERDICT r4 #3/#8: the largest open gap (paper -1.48 vs ours -88.3).
      # Tuned recipe (RESULTS.md students row), UNPACKED, 5 seeds, selected
      # on valid, with the joint-CPT lever evaluated post-hoc at M=1..4 —
      # measures whether the -88 basin is reachable without packed-tiling
      # luck AND how far the lever closes the gap.
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
      # VERDICT r4 #7: TPU twins of the CPU-trajectory joint-CPT headline
      # rows (platform-identity rule: CPU and TPU trajectories differ).
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
      timeout 300 python scripts/cptp_report.py \
          > logs/cptp-report.out 2>&1 || true
      log "cptp small done"
      ;;
    cptp_more)
      # VERDICT r4 #3: extend the campaign to netflix and plants at their
      # tuned recipes (RESULTS.md), unpacked winner seeds.
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
      timeout 300 python scripts/cptp_report.py \
          > logs/cptp-report.out 2>&1 || true
      log "cptp netflix/plants done"
      ;;
    cmll_winners)
      # VERDICT r4 #4: CMLL beside the joint-CPT winners (dna cptp-3 CMLL
      # -100.13 already landed from the CPU cell). Each winner-M recipe
      # reruns with --cmll (reference Gibbs settings, core/model.py:110-148).
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
      # VERDICT r4 #6: the cell the round-3 kill took (rc=-15)
      log "kdd retry start"
      timeout 3600 python scripts/synth_kdd.py 2>/dev/null || true
      timeout 7200 python run_pipeline.py --joblog logs/kdd-r3.jsonl \
          --result-file logs/kdd-r3-result.txt --retry-failed -m --isolate \
          --cell-timeout 3600 -n kdd -k 4096 -d 10 -b 32 -e 200 -r 0.0002 \
          -c 0.35,0.4,0.45,0.5 -g 0.99 -s 5 --vq-impl auto \
          >> logs/kdd-r3.out 2>&1 || true
      log "kdd retry done"
      ;;
    students_cmll)
      # honest CMLL for the pk-3 students winner (round-4 stage, unrun)
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
      # perf-quality gap: can bs=250 hold the bs=25 quality?
      log "bbc bs250 quality sweep start"
      bash scripts/bbc_bs250_quality.sh \
          > logs/bbc-bs250-r4.out 2>&1 || true
      log "bbc bs250 quality sweep done"
      ;;
    streaming)
      # the >4 GiB out-of-core fit (reference run.py:53 TODO)
      log "streaming bench start"
      timeout 10800 python scripts/bench_streaming.py \
          > logs/bench_streaming.out 2>&1 || true
      log "streaming bench done"
      ;;
    *) echo "unknown stage: $st" ;;
  esac
done
log "queue finished"
