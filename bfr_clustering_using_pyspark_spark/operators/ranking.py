"""Distributed EXACT global ranking — the scale path for total-order
operators (ntile, global row_number, exact percentile-by-rank).

A window with ``ORDER BY`` and no ``PARTITION BY`` funnels the whole
input through ONE task — correct, and fatal at 10⁹ rows. The classic
fix (used by every distributed sort since TeraSort) keeps the result
bit-identical:

1. ``repartitionByRange`` on the order columns — Spark samples range
   bounds so partition p holds exactly the rows ranked between
   partitions p-1 and p+1;
2. rank *locally* inside each partition (window keyed by the
   partition id — parallel across partitions);
3. add each partition's prefix offset (the count of all rows in
   earlier partitions). The offsets are ONE ROW PER PARTITION — the
   only driver materialization, bounded by the partition count, not
   the data.

As long as the order columns form a TOTAL order (callers append a
unique tiebreaker), the global rank is unique and independent of how
the sampler drew the range bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, order_cols: list[Column], out: str = "_grank"
) -> tuple[DataFrame, int]:
    """(df + exact 1-based global rank column, total row count).

    ``order_cols`` must totally order the rows (include a unique key
    as the last tiebreaker) — otherwise ranks among ties would depend
    on the sampled range bounds.
    """
    spark = df.sparkSession
    part = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    local = part.withColumn("_lrank", F.row_number().over(w))
    # one row per partition — bounded by spark.sql.shuffle.partitions
    counts = sorted(
        local.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["_cnt"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    ranked = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )
    return ranked, acc


def global_ntile(
    df: DataFrame, n_tiles: int, order_cols: list[Column], out: str
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` with no
    unpartitioned window: SQL-standard semantics (the first
    ``total % n`` buckets get one extra row), computed from the
    distributed global rank in closed form."""
    ranked, total = global_rank(df, order_cols, out="_grank")
    q, rem = divmod(total, n_tiles)
    if q == 0:
        # fewer rows than tiles: ntile degenerates to the rank itself
        tile = F.col("_grank")
    else:
        tile = (
            F.when(
                F.col("_grank") <= (q + 1) * rem,
                F.ceil(F.col("_grank") / (q + 1)),
            ).otherwise(rem + F.ceil((F.col("_grank") - (q + 1) * rem) / q))
        )
    return ranked.withColumn(out, tile.cast("int")).drop("_grank")
