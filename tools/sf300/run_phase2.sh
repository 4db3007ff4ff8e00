#!/bin/bash
# sf300 phase 2: waits for phase 1b, swaps the text/vector/event tables
# for lineitem (the full sf300 set outgrows the box's disk — see
# make_sf_scaled.py --tables), then the lineitem-reading probes:
#   flagship — engine + the new sampled oracle (full window oracle is
#              ~90 GB of DuckDB sort spill at 1.8 B rows, defect-10 class)
#   g1       — full value compare (MATERIALIZED oracle held at sf100)
#   mb1      — sampled oracle (in the set since sf100)
cd /root/repo
LOG=/root/repo/tools/sf300/phase2.log
: > "$LOG"
while pgrep -f "run_phase1b.sh\|run_phase1c.sh" > /dev/null; do sleep 30; done
echo "=== freeing phase-1 tables $(date +%H:%M:%S)" >> "$LOG"
rm -f sf_scaled/sf300/documents.parquet sf_scaled/sf300/embeddings.parquet \
      sf_scaled/sf300/events.parquet
echo "=== tiling lineitem $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
python tools/make_sf_scaled.py 3000 sf_scaled/sf300 --tables lineitem >> "$LOG" 2>&1
echo "=== tiled exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
echo "=== flagship sampled $(date +%H:%M:%S)" >> "$LOG"
timeout 5400 python tools/sampled_check.py --sf sf300 --only flagship_hitrate_last10 >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
echo "=== g1_pagerank_trade $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/check.py --sf sf300 --entry-timeout 3000 g1_pagerank_trade >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
echo "=== mb1 sampled $(date +%H:%M:%S)" >> "$LOG"
timeout 3600 python tools/sampled_check.py --sf sf300 --only mb1_frequent_pairs >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
echo "PHASE2 DONE $(date +%H:%M:%S)" >> "$LOG"
