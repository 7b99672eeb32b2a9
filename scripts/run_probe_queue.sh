#!/bin/bash
# Round-3 TPU measurement queue: run every pending probe serially (ONE TPU
# process at a time — concurrent processes queue on the remote compile
# service and appear hung). Logs to /tmp/probe_queue/<name>.log.
set -u
out=${1:-/tmp/probe_queue}
mkdir -p "$out"
cd /root/repo
for p in \
    probe_bp_factor_kernel \
    probe_bp_cuts \
    probe_csa_k2_variant \
    probe_bp_knobs \
    probe_bp_fs \
    probe_echo_spread_sweep \
; do
    echo "=== $p $(date +%H:%M:%S) ===" | tee -a "$out/queue.log"
    timeout 1500 python "scripts/$p.py" > "$out/$p.log" 2>&1
    echo "exit=$? $(date +%H:%M:%S)" | tee -a "$out/queue.log"
    tail -20 "$out/$p.log"
done
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$out/queue.log"
