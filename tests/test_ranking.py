"""operators.ranking: the distributed rank/ntile must be bit-identical
to the single-task window formulation — including across repeated
runs (regression for the sampled-range-bound drift that mis-ranked
boundary blocks)."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bfr_clustering_using_pyspark_spark.operators.ranking import (
    global_ntile,
    global_rank,
    grouped_rank,
)
from tests.conftest import SF_SMALL


def _events(spark):
    return spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "event_id", "user_id", "value"
    )


def test_global_rank_matches_window(spark):
    ev = _events(spark)
    got = {
        r["event_id"]: r["_grank"]
        for r in global_rank(
            ev, [F.desc("value"), F.col("event_id")], -F.col("value")
        ).collect()
    }
    want = {
        r["event_id"]: r["rk"]
        for r in ev.withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("value"), "event_id"))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_tiles", [2, 5, 7])
def test_global_ntile_matches_window(spark, n_tiles):
    ev = _events(spark)
    got = {
        r["event_id"]: r["tile"]
        for r in global_ntile(
            ev, n_tiles, [F.col("value"), F.col("event_id")], F.col("value"), "tile"
        ).collect()
    }
    want = {
        r["event_id"]: r["tile"]
        for r in ev.withColumn(
            "tile", F.ntile(n_tiles).over(W.orderBy("value", "event_id"))
        ).collect()
    }
    assert got == want


def test_global_ntile_degenerate_fewer_rows_than_tiles(spark):
    df = _events(spark).limit(3)
    out = global_ntile(df, 10, [F.col("event_id")], F.col("event_id"), "tile").collect()
    # SQL ntile with n > rows assigns each row its own bucket 1..rows
    assert sorted(r["tile"] for r in out) == [1, 2, 3]


def test_global_rank_uniqueness(spark):
    ev = _events(spark)
    ranked = global_rank(ev, [F.col("event_id")], F.col("event_id"))
    ranks = [r["_grank"] for r in ranked.collect()]
    assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_grouped_rank_matches_partitioned_window(spark):
    ev = _events(spark).withColumn("grp", F.col("user_id") % 7)
    got = {
        r["event_id"]: r["_grank"]
        for r in grouped_rank(
            ev, ["grp"], [F.col("value"), F.col("event_id")], F.col("value")
        ).collect()
    }
    want = {
        r["event_id"]: r["rk"]
        for r in ev.withColumn(
            "rk",
            F.row_number().over(W.partitionBy("grp").orderBy("value", "event_id")),
        ).collect()
    }
    assert got == want


def test_global_rank_stable_across_runs_lineitem(spark):
    """Regression for the cross-execution range-bound drift:
    multi-column string+double order over lineitem must rank
    identically to the window formulation on EVERY run (the sampled
    repartitionByRange design was off by a partition-boundary
    block)."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    oc = [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    want = {
        (r["l_orderkey"], r["l_linenumber"]): r["rk"]
        for r in li.withColumn(
            "rk",
            F.row_number().over(W.partitionBy("l_returnflag").orderBy(*oc)),
        ).collect()
    }
    for _ in range(2):
        got = {
            (r["l_orderkey"], r["l_linenumber"]): r["_grank"]
            for r in grouped_rank(
                li, ["l_returnflag"], oc, F.col("l_extendedprice")
            ).collect()
        }
        assert got == want


def test_global_ntile_fuzz_random_shapes(spark):
    """Property check over adversarial shapes: heavy ties, negative
    values, n barely above/below the tile count — the distributed
    ntile must equal the window formulation on all of them."""
    import random

    for seed, n, n_tiles in ((3, 7, 5), (11, 40, 7), (29, 301, 5), (47, 64, 64)):
        rng = random.Random(seed)
        rows = [(i, rng.choice([-5.0, 0.0, 1.5, 2.5])) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, v double")
        got = {
            r["id"]: r["t"]
            for r in global_ntile(
                df, n_tiles, [F.col("v"), F.col("id")], F.col("v"), "t"
            ).collect()
        }
        want = {
            r["id"]: r["t"]
            for r in df.withColumn(
                "t", F.ntile(n_tiles).over(W.orderBy("v", "id"))
            ).collect()
        }
        assert got == want, (seed, n, n_tiles)

def test_global_ntile_small_path_matches_distributed(spark):
    """The size-gated small-input path (plain window, taken when the
    caller-known total is under small_total) must be bit-equal to
    the distributed bucketed path on the same input."""
    ev = _events(spark)
    n = ev.count()
    small = {
        r["event_id"]: r["t"]
        for r in global_ntile(
            ev, 5, [F.col("value"), F.col("event_id")], F.col("value"), "t",
            total=n,  # default small_total >> n: plain-window path
        ).collect()
    }
    dist = {
        r["event_id"]: r["t"]
        for r in global_ntile(
            ev, 5, [F.col("value"), F.col("event_id")], F.col("value"), "t",
            total=n, small_total=0,  # force the distributed path
        ).collect()
    }
    assert small == dist


def test_null_sort_key_desc_nulls_last(spark):
    """Regression for NULL bucket routing: with a DESC leading key
    (negated bucket expr) Spark sorts NULLS LAST, so NULL rows must
    land in the LAST bucket (nulls='last'), not bucket 0 — bucket 0
    would hand them a small prefix offset and rank them inside the
    top block."""
    rows = [(i, float(i % 13) if i % 9 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["_grank"]
        for r in global_rank(
            df, [F.desc("v"), F.col("id")], -F.col("v"), nulls="last"
        ).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("v"), "id"))
        ).collect()
    }
    assert got == want


def test_null_sort_key_asc_nulls_first(spark):
    """ASC leading key: NULLS FIRST, default nulls='first' routing."""
    rows = [(i, float(i % 13) if i % 9 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["id"]: r["_grank"]
        for r in global_rank(df, [F.col("v"), F.col("id")], F.col("v")).collect()
    }
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(W.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_bucket_cuts_single_shuffle_partition(spark):
    """A 1-shuffle-partition session must not produce an empty probs
    array (percentile_approx([]) fails at plan time) — the clamp
    floors the bucket count at 2."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        df = _events(spark).limit(50)
        ranked = global_rank(df, [F.col("value"), F.col("event_id")], F.col("value"))
        ranks = sorted(r["_grank"] for r in ranked.collect())
        assert ranks == list(range(1, len(ranks) + 1))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_grouped_rank_keeps_null_group_rows(spark):
    """Rows whose group column is NULL must survive and rank as
    their own partition — exactly like the plain window formulation
    (a null-unsafe offsets join used to silently drop them)."""
    rows = [
        (i, None if i % 5 == 0 else f"g{i % 3}", float(i % 17)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {
        (r["grp"], r["id"]): r["_grank"]
        for r in grouped_rank(
            df, ["grp"], [F.col("v"), F.col("id")], F.col("v")
        ).collect()
    }
    want = {
        (r["grp"], r["id"]): r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(W.partitionBy("grp").orderBy("v", "id"))
        ).collect()
    }
    assert len(got) == 120  # nothing dropped, NULL group included
    assert got == want


def test_global_prefix_sum_matches_window(spark):
    """The two-phase distributed scan must be bit-identical to the
    naive unpartitioned running-sum window, including under a
    different input partitioning."""
    from bfr_clustering_using_pyspark_spark.operators.ranking import (
        global_prefix_sum,
    )

    ev = _events(spark).select(
        "event_id", (F.col("value") * 100).cast("long").alias("v")
    )
    want = {
        r["event_id"]: r["ps"]
        for r in ev.withColumn(
            "ps",
            F.sum("v").over(
                W.partitionBy(F.lit(0))
                .orderBy("event_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        ).collect()
    }
    for n_parts in (1, 7):
        got = {
            r["event_id"]: r["ps"]
            for r in global_prefix_sum(
                ev.repartition(n_parts),
                [F.col("event_id")],
                F.col("event_id"),
                F.col("v"),
                out="ps",
            ).collect()
        }
        assert got == want
