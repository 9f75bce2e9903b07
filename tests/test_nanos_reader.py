"""The TIMESTAMP(NANOS) branch of ``normalize_ts``.

The shipped testdata stores ``timestamp[us]``, so the LONG branch —
a nanos file scanned under ``spark.sql.legacy.parquet.nanosAsLong``
(which ``load_table`` enables defensively for events) — never fires
on it. This test writes a real nanos parquet and proves the branch
recovers microsecond truth, guarding the r2/r3 regression (an
unconditional div-1000 corrupting already-correct timestamps) from
both directions.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq


def test_nanos_events_scan_matches_micros(spark, tmp_path):
    from bfr_clustering_using_pyspark_spark.sources.readers import load_table

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    ts = [base + datetime.timedelta(seconds=i, microseconds=123456) for i in range(5)]
    table = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["view"] * 5),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
        }
    )
    sf_dir = tmp_path / "sf_nanos"
    sf_dir.mkdir()
    pq.write_table(table, sf_dir / "events.parquet")

    got = (
        load_table(spark, str(sf_dir), "events")
        .orderBy("event_id")
        .select("ts")
        .collect()
    )
    # the nanos file scans as LONG under nanosAsLong; normalize_ts
    # must emit micros-truth timestamps (ts div 1000)
    assert [r["ts"] for r in got] == ts

    # and the micros testdata path stays untouched (no double div-1000)
    from tests.conftest import SF_SMALL

    real = load_table(spark, SF_SMALL, "events").agg({"ts": "min"}).collect()[0][0]
    assert real.year >= 2020, f"micros path corrupted: {real}"


def test_custom_points_datasource_partitioning(spark):
    """The bfr_points DataSource must expose one input partition per
    chunk file and parse executor-side to the probed schema."""
    from bfr_clustering_using_pyspark_spark.plans.ml_queries import (
        source_custom_points,
    )

    from tests.conftest import SF_SMALL

    df = source_custom_points(spark, SF_SMALL)
    assert df.columns == ["id", "d0", "d1", "d2"]
    # the source itself (pre-orderBy) reads 4 chunks as 4 partitions
    import tempfile, os
    from bfr_clustering_using_pyspark_spark.sources.custom import (
        register_points_source,
    )

    d = tempfile.mkdtemp()
    for c in range(3):
        with open(os.path.join(d, f"chunk{c}.csv"), "w") as f:
            f.write(f"{c},1.5,2.5\n")
    register_points_source(spark)
    raw = spark.read.format("bfr_points").option("path", d).load()
    assert raw.rdd.getNumPartitions() == 3
    assert raw.columns == ["id", "d0", "d1"]
    assert sorted(tuple(r) for r in raw.collect()) == [
        (0, 1.5, 2.5), (1, 1.5, 2.5), (2, 1.5, 2.5)
    ]
