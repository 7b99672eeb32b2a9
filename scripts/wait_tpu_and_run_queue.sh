#!/bin/bash
# Poll the axon TPU pool (bounded jax.devices() probe) and run the round-3
# measurement queue (run_probe_queue.sh) as soon as a device shows up.
# Logs to /tmp/probe_queue/wait.log. One probe process at a time.
set -u
out=${1:-/tmp/probe_queue}
mkdir -p "$out"
cd /root/repo
echo "WAIT START $(date -u +%H:%M:%S)" >> "$out/wait.log"
while true; do
    # require a real TPU device: on a fast init failure JAX falls back to
    # CPU and a bare jax.devices() would "succeed"
    if timeout 120 python -c "
import jax
d = jax.devices()
print(d)
assert d and d[0].platform != 'cpu', 'cpu fallback'
" >> "$out/wait.log" 2>&1; then
        echo "TPU UP $(date -u +%H:%M:%S)" >> "$out/wait.log"
        break
    fi
    echo "tpu down $(date -u +%H:%M:%S)" >> "$out/wait.log"
    sleep 60
done
bash scripts/run_probe_queue.sh "$out"
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$out/wait.log"
