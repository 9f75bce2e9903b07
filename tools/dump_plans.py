"""Dump .explain('formatted') for registry keys to an output dir.

Usage: python tools/dump_plans.py OUT_DIR [key ...]   (default: all batch keys)

Streaming keys are skipped unless named explicitly (their callables
run a full drain on plan construction; plan text for those is the
foreachBatch batch plan, which explain can't show statically).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entry

out_dir = sys.argv[1]
keys = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
os.makedirs(out_dir, exist_ok=True)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
if not keys:
    keys = [k for k in sorted(qs) if not k.startswith("stream_")]

for k in keys:
    try:
        df = qs[k](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as e:  # noqa: BLE001 — record the failure, keep going
        txt = f"ERROR: {type(e).__name__}: {e}"
    with open(os.path.join(out_dir, f"{k}.txt"), "w") as fh:
        fh.write(txt)
    print(k, "ok" if not txt.startswith("ERROR") else "ERR", flush=True)
spark.stop()
