#!/bin/bash
# sf300 (3000x) phase-1 probe: entries that read no lineitem, one per
# process (a failed job's shuffle spill stays on disk until the JVM exits
# — BENCH_sf1.md defect 9), cheapest first so a rig problem surfaces early.
cd /root/repo
LOG=/root/repo/tools/sf300/phase1.log
: > "$LOG"
for e in sky1_pareto_frontier sim_ivf_batch_topk a43_rfm_segmentation \
         d5_minhash_lsh_pairs s11_stream_incremental_minhash; do
  echo "=== $e $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
  timeout 3600 python tools/check.py --sf sf300 --entry-timeout 3000 "$e" >> "$LOG" 2>&1
  echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "PHASE1 DONE $(date +%H:%M:%S)" >> "$LOG"
