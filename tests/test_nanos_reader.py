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
