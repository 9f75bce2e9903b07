"""Warm-timing sweep over every batch registry key at a given sf_dir:
one warm-up run then N timed runs per key, min reported. Streaming
keys are included (their callables drain on call) but get a single
timed run. Output: one 'key\tmin_sec\trows' line per key.

Usage: python tools/sweep_warm.py SF_DIR [OUT_TSV]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry

sf_dir = sys.argv[1]
out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_warm.tsv"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()

with open(out_path, "w") as fh:
    for k in sorted(qs):
        fn = qs[k]
        streaming = k.startswith("stream_")
        try:
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            first = time.monotonic() - t0
            best = first
            if not streaming:
                for _ in range(2):
                    t0 = time.monotonic()
                    fn(spark, sf_dir).count()
                    best = min(best, time.monotonic() - t0)
            line = f"{k}\t{best:.3f}\t{first:.3f}\t{n}"
        except Exception as e:  # noqa: BLE001
            line = f"{k}\tERR\tERR\t{type(e).__name__}: {e}"
        print(line, flush=True)
        fh.write(line + "\n")
        fh.flush()
spark.stop()
