"""Warm-timing harness for single keys: run each key N times at the
given sf_dir on local[32], print min/median wall seconds. Usage:
python tools/time_one.py sf_dir key [key ...]"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

import __spark_entry__ as entry

sf_dir = sys.argv[1]
keys = sys.argv[2:]
spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
for k in keys:
    qs[k](spark, sf_dir).count()  # warm
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        qs[k](spark, sf_dir).count()
        ts.append(time.monotonic() - t0)
    print(f"{k}: min={min(ts):.3f}s med={statistics.median(ts):.3f}s")
spark.stop()
