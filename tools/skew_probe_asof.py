"""Skew probe for q_asof_grouped's applyInPandas group buffer.

The grouped-map formulation buffers ONE USER's whole event slice in a
single pandas frame; a skewed corpus (one user owning 10% of events)
concentrates that buffer on one task. This probe measures it: build
balanced and skewed copies of the events table at x1 and xK, time
q_asof_grouped (and q_asof_join, the window formulation, for
context) on each, and report the skew penalty + scale curvature.

Usage: python tools/skew_probe_asof.py [K]   # default K=10
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

HOT_MOD = 10  # event_id % 10 == 0 -> hot user (10% of the corpus)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    import __spark_entry__ as m
    from bfr_clustering_using_pyspark_spark.session import get_spark
    from tools.scale_probe import build_scaled_dir

    spark = get_spark("skew_probe_asof")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()

    base = tempfile.mkdtemp(prefix="skew_asof_")
    try:
        for mult in (1, k):
            bal = os.path.join(base, f"bal_x{mult}")
            build_scaled_dir(spark, src, bal, mult)
            skw = os.path.join(base, f"skw_x{mult}")
            os.makedirs(skw, exist_ok=True)
            for t in os.listdir(bal):
                if t != "events.parquet":
                    p = os.path.join(bal, t)
                    (shutil.copytree if os.path.isdir(p) else shutil.copy)(
                        p, os.path.join(skw, t)
                    )
            ev = spark.read.parquet(os.path.join(bal, "events.parquet"))
            ev.withColumn(
                "user_id",
                F.when(F.col("event_id") % HOT_MOD == 0, F.lit(1)).otherwise(
                    F.col("user_id")
                ),
            ).write.mode("overwrite").parquet(os.path.join(skw, "events.parquet"))
            for key in ("q_asof_grouped", "q_asof_join"):
                # warm the Python UDF workers / Arrow path once so
                # the x1 row isn't cold-start pollution
                qs[key](spark, bal).count()
                for label, d in (("bal", bal), ("skw", skw)):
                    t0 = time.time()
                    n = len(qs[key](spark, d).collect())
                    print(
                        f"x{mult:<3d} {label} {key:16s} {time.time() - t0:7.2f}s"
                        f"  ({n} rows)",
                        flush=True,
                    )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
