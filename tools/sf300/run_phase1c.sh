#!/bin/bash
# d5_minhash at sf300 joins the SAMPLED oracle set: the full oracle's
# signature aggregate — 12 MIN(md5(seed:shingle)) per doc over the whole
# unnested 15M-doc corpus — overshot DuckDB's 40 GB memory cap to 77 GB
# anon RSS and the kernel OOM-killed the process (memory_limit does not
# bound every operator). Defect-10 class, oracle-side. The sampled check
# (tools/sampled_check.py check_d5_minhash) is exact in both directions
# and avoids the full-corpus signature aggregate entirely.
cd /root/repo
LOG=/root/repo/tools/sf300/phase1c.log
: > "$LOG"
while pgrep -f "run_phase1b.sh" > /dev/null; do sleep 30; done
echo "=== d5_minhash sampled $(date +%H:%M:%S) free=$(df --output=avail -BG / | tail -1)" >> "$LOG"
timeout 3600 python tools/sampled_check.py --sf sf300 --only d5_minhash_lsh_pairs >> "$LOG" 2>&1
echo "=== exit=$? $(date +%H:%M:%S)" >> "$LOG"
echo "PHASE1C DONE $(date +%H:%M:%S)" >> "$LOG"
