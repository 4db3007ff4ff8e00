#!/bin/bash
# sf300 lineitem-probe retries with maximum freed scratch. The first
# attempts ran with sf300 lineitem (31 GB) + sf100 (17 GB) resident and
# ≤24 GB free — flagship's engine window shuffle, g1's oracle spill, and
# mb1's sampled-oracle spill each hit the disk wall. This block waits
# for the text-probe pipeline, swaps the text tables back out, TEMPORARILY
# drops sf100/lineitem + sf1 (both regenerable via make_sf_scaled), and
# retries with ~29 GB of scratch, cheapest-disk first. Restores the
# dropped tilings afterwards.
cd /root/repo
LOG=/root/repo/tools/sf300/retry_li.log
: > "$LOG"
REST_PID="${1:-}"
if [ -n "$REST_PID" ]; then
  while [ -d "/proc/$REST_PID" ]; do sleep 20; done
fi
echo "=== text pipeline finished $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
rm -f sf_scaled/sf300/documents.parquet sf_scaled/sf300/embeddings.parquet
rm -f sf_scaled/sf100/lineitem.parquet
rm -rf sf_scaled/sf1
echo "=== freed; re-tiling sf300 lineitem $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
python tools/make_sf_scaled.py 3000 sf_scaled/sf300 --tables lineitem >> "$LOG" 2>&1
echo "=== tiled exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

echo "=== g1_pagerank_trade retry $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/check.py --sf sf300 --entry-timeout 3000 g1_pagerank_trade >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

echo "=== mb1 sampled retry $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/sampled_check.py --sf sf300 --only mb1_frequent_pairs >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

echo "=== flagship sampled retry $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python tools/sampled_check.py --sf sf300 --only flagship_hitrate_last10 >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"

# restore the dropped tilings (sf30 is restored separately at round close)
echo "=== restoring sf100 lineitem + sf1 $(date +%H:%M:%S)" >> "$LOG"
python tools/make_sf_scaled.py 1000 sf_scaled/sf100 --tables lineitem >> "$LOG" 2>&1
python tools/make_sf_scaled.py 10 sf_scaled/sf1 >> "$LOG" 2>&1
echo "=== restored exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
echo "RETRY DONE $(date +%H:%M:%S)" >> "$LOG"
