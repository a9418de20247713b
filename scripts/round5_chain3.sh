#!/bin/bash
# Round-5 chain 3: runs AFTER scripts/round5_followup2.sh releases the
# chip. One job: the bbc bs=250 quality sweep, re-run UNPACKED (the pk-3
# attempt OOM'd — logs/bbc-bs250-r4.out), then a final bench+report
# refresh. Respects the same round-end deadline: past DEADLINE_UTC the
# sweep is skipped so the driver's round-end bench finds the chip free.
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

DEADLINE_UTC=${DEADLINE_UTC:-2100}
past_deadline() { [ "$(date -u +%H%M)" -ge "$DEADLINE_UTC" ]; }

probe || true
if past_deadline; then
  log "skip bbc250 unpacked (past deadline $DEADLINE_UTC)"
else
  log "bbc250 unpacked quality sweep start"
  bash scripts/bbc_bs250_quality.sh > logs/bbc-bs250-r5.out 2>&1 || true
  log "bbc250 unpacked quality sweep done"
fi
probe || true
log "chain3 bench start"
timeout 3600 python bench.py > logs/bench_r5d.out 2>&1 || true
log "chain3 bench done"
timeout 300 python scripts/cptp_report.py > logs/cptp-report.out 2>&1 || true
log "chain3 finished"
