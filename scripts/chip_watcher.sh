#!/bin/bash
# Wait for the axon TPU grant to come back, then launch the round-4 queue.
# Detached-safe: probes every 2 min with a bounded jax.devices() call; each
# probe process exits (releasing any grant) before the next starts. Once a
# probe succeeds, runs scripts/round4_tpu_queue.sh and exits.
set -u
cd "$(dirname "$0")/.."
echo "watcher start: $(date -u +%H:%M:%S)"
while true; do
  if timeout 240 python -c "import jax; jax.devices(); print('up')" \
      2>/dev/null | grep -q up; then
    echo "chip up: $(date -u +%H:%M:%S)"
    break
  fi
  echo "chip still down: $(date -u +%H:%M:%S)"
  sleep 120
done
bash scripts/round4_tpu_queue.sh
