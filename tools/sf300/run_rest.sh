#!/bin/bash
# sf300 probe pipeline, rebuilt after the pgrep-sequencing failure:
# pgrep -f waiters matched the harness wrapper shells that carry the
# script text in their own command lines (and ERE treats \| as a literal
# pipe), so one phase jumped the queue and deleted tables before their
# probes ran. Sequencing is now EXPLICIT inside one script, no process
# polling. Disk choreography (~58 GB total budget):
#   A. wait for the in-flight lineitem tiler (by pid file argument)
#   B. drop sf30 (regenerable: make_sf_scaled.py 300) for oracle headroom
#   C. lineitem probes: flagship (sampled), g1 (full), mb1 (sampled)
#   D. drop lineitem; re-tile documents + embeddings (events not needed
#      by any remaining probe)
#   E. text/vector probes: ta_global_shuffle_shard (full), d5_cc
#      (sampled), d5_minhash (sampled), sim_ivf (full, rewritten
#      oracle), s11 retry (16 threads + worker faulthandler)
cd /root/repo
LOG=/root/repo/tools/sf300/rest.log
: > "$LOG"
TILER_PID="${1:-}"
if [ -n "$TILER_PID" ]; then
  while [ -d "/proc/$TILER_PID" ]; do sleep 20; done
fi
echo "=== tiler finished $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
rm -rf sf_scaled/sf30
echo "=== dropped sf30 $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

echo "=== flagship sampled $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python tools/sampled_check.py --sf sf300 --only flagship_hitrate_last10 >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

echo "=== g1_pagerank_trade $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/check.py --sf sf300 --entry-timeout 3000 g1_pagerank_trade >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

echo "=== mb1 sampled $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/sampled_check.py --sf sf300 --only mb1_frequent_pairs >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

rm -f sf_scaled/sf300/lineitem.parquet
echo "=== dropped lineitem; re-tiling documents+embeddings $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
python tools/make_sf_scaled.py 3000 sf_scaled/sf300 --tables documents,embeddings >> "$LOG" 2>&1
echo "=== re-tiled exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

echo "=== ta_global_shuffle_shard $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/check.py --sf sf300 --entry-timeout 3000 ta_global_shuffle_shard >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"

echo "=== d5_cc sampled $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/sampled_check.py --sf sf300 --only d5_cc_clusters_multipart >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"

echo "=== d5_minhash sampled $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/sampled_check.py --sf sf300 --only d5_minhash_lsh_pairs >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"

echo "=== sim_ivf_batch_topk $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/check.py --sf sf300 --entry-timeout 3000 sim_ivf_batch_topk >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"

echo "=== s11 retry (16 threads, faulthandler) $(date +%H:%M:%S)" >> "$LOG"
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_EXTRA_FAULTHANDLER=1 \
timeout 5400 python tools/check.py --sf sf300 --entry-timeout 5000 \
  s11_stream_incremental_minhash >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
echo "REST DONE $(date +%H:%M:%S)" >> "$LOG"
