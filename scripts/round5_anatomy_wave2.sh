#!/bin/bash
# MFU-ceiling wave 2 (round 5): the bs=1000 masked cell crashed the worker
# ([n,B,n] backward peak > 16 GB), so the ceiling is measured two ways:
#   - bs=500 masked bf16: the largest batch the masked design fits
#   - bs=1000 rank1 bf16: the rank-1 first layer never materializes
#     [n,B,n], so it fits where masked cannot — is the memory-bound
#     escape also the throughput winner at batches masked can't reach?
set -u
cd "$(dirname "$0")/.."
log() { echo "== $1: $(date -u +%H:%M:%S) ==" | tee -a logs/round5_queue.out; }
log "anatomy wave2 start"
timeout 1800 python scripts/bench_step_anatomy.py --batch 500 \
    --adam-impl fused_bf16 --compute-dtype bf16 \
    > logs/anatomy_bf16_bs500.out 2>&1 || true
timeout 1800 python scripts/bench_step_anatomy.py --batch 1000 \
    --first-layer rank1 --adam-impl fused_bf16 --compute-dtype bf16 \
    > logs/anatomy_bf16_bs1000_rank1.out 2>&1 || true
log "anatomy wave2 done"
