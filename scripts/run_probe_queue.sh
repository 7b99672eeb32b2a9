#!/bin/bash
# Round-3 TPU measurement queue: run every pending probe serially (ONE TPU
# process at a time — concurrent processes queue on the remote compile
# service and appear hung). Logs to /tmp/probe_queue/<name>.log.
set -u
out=${1:-/tmp/probe_queue}
mkdir -p "$out"
cd /root/repo
# ordered by decision value (a short pool window should still settle the
# BP accumulate, the GMTI K2/lead variants and the echo spreader sizing)
for p in \
    probe_bp_factor_kernel \
    probe_csa_k2_variant \
    probe_echo_spread_sweep \
    probe_bp_stream \
    probe_bp_cuts \
    probe_bp_knobs \
    probe_bp_fs \
    probe_echo_dense_stages \
; do
    echo "=== $p $(date +%H:%M:%S) ===" | tee -a "$out/queue.log"
    timeout 1500 python "scripts/$p.py" > "$out/$p.log" 2>&1
    echo "exit=$? $(date +%H:%M:%S)" | tee -a "$out/queue.log"
    tail -20 "$out/$p.log"
done
# bench A/B: committed default vs the new factor kernel path
echo "=== bench default $(date +%H:%M:%S) ===" | tee -a "$out/queue.log"
timeout 1800 python bench.py > "$out/bench_default.log" 2>&1
tail -2 "$out/bench_default.log"
echo "=== bench factor_kernel $(date +%H:%M:%S) ===" | tee -a "$out/queue.log"
BENCH_BP_ACC=factor_kernel timeout 1800 python bench.py \
    > "$out/bench_fkernel.log" 2>&1
tail -2 "$out/bench_fkernel.log"
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a "$out/queue.log"
