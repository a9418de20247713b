#!/bin/bash
# Round-4 (VERDICT r3 #5): close the perf-quality gap at bbc.
#
# The tuned bbc recipe (test -255.648) trains at bs=25 = 1.3% MFU; the
# throughput bench (7.3% MFU) runs bs=250 — but no evidence existed that
# bs=250 can match bs=25's quality. This sweep searches the lr axis at
# bs=250 with the round-2 winning recipe otherwise unchanged (fm=per_network,
# dcr=0.25, gamma=0.9, sov=50), selecting on valid. Round 5: seeds run
# UNPACKED — pk-3 vmapped bbc cells at bs=250 OOM the 16 GB chip
# ([3, n, B, u] activations, logs/bbc-bs250-r4.out), and the round-4
# verdict's own guidance is unpacked campaigns unless compile-bound.
# A second pass doubles epochs (bs=250 sees 10x fewer steps per epoch than
# bs=25, so 600 epochs = 4.2k steps vs the winner's 40k).
set -u
cd "$(dirname "$0")/.."
JOBLOG=${JOBLOG:-logs/bbc-bs250-r4.jsonl}
RESULT=${RESULT:-logs/bbc-bs250-r4-result.txt}

run() {
  timeout 14400 python run_pipeline.py --joblog "$JOBLOG" \
      --result-file "$RESULT" -m --isolate \
      --cell-timeout 7200 -n bbc -k 50 -d 20 -b 250 -c 0.05 -g 0.9 \
      --fan-mode per_network --dead-code-threshold 0.25 \
      --select-on-valid 50 -s 1,2,3 "$@" || true
}

run -e 600  -r 0.003,0.01,0.03
run -e 1200 -r 0.01
echo "bbc bs250 quality sweep done; joblog=$JOBLOG"
