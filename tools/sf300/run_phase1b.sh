#!/bin/bash
# sf300 phase-1b: waits for phase 1 to finish, then the remaining
# no-lineitem probes — sim_ivf (oracle rewritten after the 22 GB spill),
# ta_global_shuffle_shard, and the d5_cc sampled oracle.
cd /root/repo
LOG=/root/repo/tools/sf300/phase1b.log
: > "$LOG"
while pgrep -f "run_phase1.sh" > /dev/null; do sleep 30; done
for e in sim_ivf_batch_topk ta_global_shuffle_shard; do
  echo "=== $e $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
  timeout 3600 python tools/check.py --sf sf300 --entry-timeout 3000 "$e" >> "$LOG" 2>&1
  echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
done
echo "=== d5_cc sampled $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/sampled_check.py --sf sf300 --only d5_cc_clusters_multipart >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
echo "PHASE1B DONE $(date +%H:%M:%S)" >> "$LOG"
