"""Engine-only a43 rerun at a deep decade, with a /proc/stat CPU sampler —
the VERDICT r9 item-2 probe (previous measurement: 514.5 s, 18 AQE
partitions, 14 of 32 cores idle through the window stages)."""
import os
import sys

sys.path.insert(0, "/root/repo")
import threading
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf_scaled/sf300"

samples = []
stop = threading.Event()


def _cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = list(map(int, parts))
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals), idle


def sampler():
    prev_t, prev_i = _cpu_times()
    while not stop.wait(5):
        t, i = _cpu_times()
        dt, di = t - prev_t, i - prev_i
        prev_t, prev_i = t, i
        if dt:
            samples.append(1 - di / dt)


threading.Thread(target=sampler, daemon=True).start()

import __spark_entry__ as m  # noqa: E402
from nba_data_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark(
    "a43-engine-only", cpus=32,
    extra_conf={"spark.io.compression.codec": "zstd"},
)
t0 = time.time()
df = m.queries()["a43_rfm_segmentation"](spark, SF_DIR)
rows = df.collect()
wall = time.time() - t0
stop.set()
busy = sorted(samples)
mid = busy[len(busy) // 2] if busy else 0.0
avg = sum(busy) / len(busy) if busy else 0.0
print(f"RESULT rows={len(rows)} wall={wall:.1f}s "
      f"cpu_avg={avg:.2f} cpu_median={mid:.2f} n_samples={len(samples)}")
