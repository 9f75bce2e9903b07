"""Distributed EXACT ranking — the scale path for total-order
operators (ntile, global row_number, exact percentile-by-rank).

A window with ``ORDER BY`` and no ``PARTITION BY`` funnels the whole
input through ONE task — correct, and fatal at 10⁹ rows. The classic
fix: split the order domain into contiguous buckets, rank locally
inside each bucket (parallel), then add each bucket's prefix offset.

DESIGN POINT — deterministic buckets, not sampled ranges.
``repartitionByRange`` samples its bounds with a seed derived from
the RDD id, so every query execution (and even separate branches of
one plan, absent exchange reuse) can draw DIFFERENT bounds; pairing
per-partition counts from one sampling with local ranks from another
silently mis-ranks whole boundary blocks (observed on lineitem and on
the chained RFM ntiles). Here the bucket cuts are collected ONCE from
``approx_percentile`` and frozen as plan LITERALS: bucket assignment
becomes a pure row function, so the count branch, the rank branch,
and any number of re-executions agree by construction. The cut
quality only affects balance, never correctness — a total order on
``order_cols`` (callers append a unique tiebreaker) makes the rank
unique whatever the cuts are.

Parallelism note: all rows EQUAL on the bucket expression land in one
bucket (strict ``>`` cuts keep buckets contiguous), so a tie-heavy
leading column (e.g. an order frequency with 50 distinct values)
bounds effective parallelism by its distinct count — still orders of
magnitude better than one global task, and each bucket's window sort
spills to disk rather than buffering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.tuning import shuffle_width

BUCKET_ACC = 1000  # approx_percentile accuracy for the cut sketch
MAX_BUCKETS = 64
# Bucket-count cap: correctness never depends on it (any cut set
# yields the same ranks), it only bounds per-bucket sort size vs
# expression size. Uncapped, a vanilla 200-shuffle-partition session
# produced a 199-cut expression that blew Janino's 64 KB method limit
# and fell back to interpreted eval (~4× slower end to end); 64
# buckets keep codegen alive and still parallelize each ranking pass
# 64 ways, with per-bucket window sorts spilling rather than
# buffering. Raise it alongside a coarser cut representation if a
# workload needs more spread.


def bucket_cuts(df: DataFrame, exprs: list[Column]) -> list[list[float]]:
    """Approx-percentile cut arrays for several bucket expressions in
    ONE action (≤ MAX_BUCKETS doubles each). Precompute these when
    chaining several ranks over one input — each chained rank's own
    sketch would otherwise re-execute all upstream stages."""
    spark = df.sparkSession
    # clamp below by 2: a 1-partition session would otherwise produce
    # an EMPTY probs array and percentile_approx([]) fails at plan
    # time; 2 buckets (one median cut) is the degenerate-but-valid
    # floor
    n_parts = max(
        2, min(shuffle_width(spark), MAX_BUCKETS)
    )
    probs = F.array(*[F.lit(i / n_parts) for i in range(1, n_parts)])
    row = df.select(
        *[
            F.percentile_approx(e.cast("double"), probs, BUCKET_ACC).alias(f"c{i}")
            for i, e in enumerate(exprs)
        ]
    ).first()
    return [sorted(set(row[i] or [])) if row else [] for i in range(len(exprs))]


def _bucket_col(
    df: DataFrame, bucket_expr: Column, cuts: list[float] | None, nulls: str
) -> Column:
    """Deterministic contiguous bucket id: cuts are approx-percentile
    literals (collected once), bucket = #cuts strictly below the
    row's value — a pure row function, identical in every plan
    branch and every re-execution. Evaluated as a fold over ONE
    literal array so the (possibly expensive) bucket expression
    appears exactly once in the fold regardless of cut count.

    NULL routing: a NULL bucket value must land in the bucket where
    the window's ORDER BY will place the row, or the prefix offsets
    mis-rank it. ``nulls='first'`` (ASC leading key — Spark sorts
    NULLS FIRST) routes NULLs to bucket 0; ``nulls='last'`` (DESC
    leading key — NULLS LAST) routes them to the final bucket. The
    bare fold would silently send NULLs to bucket 0 either way
    (NULL > c is NULL → otherwise-0), wrong for DESC."""
    if cuts is None:
        cuts = bucket_cuts(df, [bucket_expr])[0]
    if not cuts:
        return F.lit(0)
    arr = F.array(*[F.lit(c) for c in cuts])
    fold = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, c: acc
        + F.when(bucket_expr.cast("double") > c, F.lit(1)).otherwise(F.lit(0)),
    )
    null_bucket = F.lit(len(cuts) if nulls == "last" else 0)
    # coalesce with a literal marks the column PROVABLY NON-NULL, so
    # when the bucket id becomes a window-partition/join key Catalyst
    # folds the inferred isnotnull(_bkt) to true instead of pushing a
    # Filter that RE-EVALUATES this whole fold per row below the
    # exchange (the r8 pushed-down-recompute defect; the fallback arm
    # never fires — the isNull branch already covers the only way the
    # fold could be null)
    return F.coalesce(F.when(bucket_expr.isNull(), null_bucket).otherwise(fold), null_bucket)


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    bucket_expr: Column,
    out: str = "_grank",
    cuts: list[float] | None = None,
    nulls: str = "first",
) -> DataFrame:
    """df + exact 1-based rank over ``order_cols`` WITHIN each
    ``group_cols`` group (global rank when ``group_cols`` is empty).

    ``bucket_expr`` must be a numeric expression ascending-aligned
    with the leading sort direction of ``order_cols`` within a group
    (negate it for a DESC leading column — and then ALSO pass
    ``nulls='last'`` if the column is nullable, so NULL rows bucket
    where DESC NULLS LAST sorts them). ``order_cols`` must
    totally order each group — append a unique tiebreaker.

    Plan: one bucket-cut sketch action (≤P doubles collected), then a
    single lazy plan — window keyed by (group, bucket), per-(group,
    bucket) counts cumsum'd by a bounded ≤P-row-per-group window, and
    a broadcast join adding the offsets. No n-sized frame anywhere.
    """
    bkt = _bucket_col(df, bucket_expr, cuts, nulls).alias("_bkt")
    part = df.withColumn("_bkt", bkt)
    keys = [*group_cols, "_bkt"]
    w = W.partitionBy(*keys).orderBy(*order_cols)
    local = part.withColumn("_lrank", F.row_number().over(w))
    cnts = part.groupBy(*keys).agg(F.count("*").alias("_cnt"))
    # the global-offsets variant partitions on a constant: same
    # bounded ≤MAX_BUCKETS-row frame, but avoids WindowExec's
    # "no partition defined" warning spam in driver logs
    w_off = (
        W.partitionBy(*group_cols).orderBy("_bkt")
        if group_cols
        else W.partitionBy(F.lit(0)).orderBy("_bkt")
    ).rowsBetween(W.unboundedPreceding, -1)
    offs = cnts.select(
        *keys, F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    # NULL-SAFE equality on the group columns: groupBy and
    # partitionBy both treat NULL as its own group, so the offsets
    # frame has a row for NULL groups — a plain equi-join would
    # silently drop those rows here
    l, o = local.alias("_rk_l"), offs.alias("_rk_o")
    cond = F.col("_rk_l._bkt") == F.col("_rk_o._bkt")
    for c in group_cols:
        cond = cond & F.col(f"_rk_l.{c}").eqNullSafe(F.col(f"_rk_o.{c}"))
    return (
        l.join(F.broadcast(o), cond)
        .select("_rk_l.*", F.col("_rk_o._off").alias("_off"))
        .withColumn(out, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_bkt", "_lrank", "_off")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    bucket_expr: Column,
    out: str = "_grank",
    cuts: list[float] | None = None,
    nulls: str = "first",
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_cols)`` with
    no unpartitioned n-sized window (see ``grouped_rank``)."""
    return grouped_rank(df, [], order_cols, bucket_expr, out, cuts, nulls)


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    bucket_expr: Column,
    val: Column,
    out: str = "_psum",
    cuts: list[float] | None = None,
) -> DataFrame:
    """Exact INCLUSIVE prefix sum of integer ``val`` over a global
    total order — the sum analogue of ``global_rank`` (the textbook
    two-phase distributed scan): running sum within each
    deterministic literal-cut bucket (parallel), per-bucket totals
    cumsum'd by a bounded ≤MAX_BUCKETS-row window, broadcast join
    adds each bucket's prefix offset. ``val`` must be integral —
    integer addition is associative/commutative, so the result is
    partitioning-invariant by construction (a double val would not
    be). ``order_cols`` must totally order the frame."""
    bkt = _bucket_col(df, bucket_expr, cuts, "first").alias("_bkt")
    part = df.withColumn("_bkt", bkt)
    w = (
        W.partitionBy("_bkt")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = part.withColumn("_lsum", F.sum(val).over(w))
    sums = part.groupBy("_bkt").agg(F.sum(val).alias("_s"))
    w_off = (
        W.partitionBy(F.lit(0)).orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    )
    offs = sums.select(
        "_bkt", F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offs), "_bkt")
        .withColumn(out, (F.col("_off") + F.col("_lsum")).cast("long"))
        .drop("_bkt", "_lsum", "_off")
    )


# Size gate for global_ntile's distributed machinery: below this many
# rows a single-task ntile window is strictly cheaper than the
# cut-sketch + bucketed-rank + broadcast-offset pipeline (the window
# sorts ≤SMALL_TOTAL rows in one task — bounded by the constant, not
# by the data). Callers that KNOW the input is an already-aggregated
# small frame pass ``total`` and get the cheap plan automatically;
# the distributed plan remains the only path when total is unknown or
# large, so nothing n-sized ever rides a single window task. Both
# paths are bit-equal (SQL-standard ntile) — pinned in
# tests/test_ranking.py.
SMALL_TOTAL = 100_000


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[Column],
    bucket_expr: Column,
    out: str,
    cuts: list[float] | None = None,
    total: int | None = None,
    small_total: int = SMALL_TOTAL,
    nulls: str = "first",
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)``: SQL-standard
    semantics (the first ``total % n`` buckets get one extra row)
    computed in closed form from the distributed rank and a broadcast
    1-row total — a single lazy plan, no n-sized window. When the
    caller-known ``total`` is under ``small_total`` the plain window
    formulation is used instead (see SMALL_TOTAL)."""
    if total is not None and total <= small_total:
        w = W.partitionBy(F.lit(0)).orderBy(*order_cols)
        return df.withColumn(out, F.ntile(n_tiles).over(w))
    ranked = global_rank(df, order_cols, bucket_expr, "_grank", cuts, nulls)
    if total is not None:
        # caller-known total (e.g. a counted, persisted input): skip
        # the in-plan total branch entirely
        tot_col, drop_tot = F.lit(int(total)), False
    else:
        ranked = ranked.crossJoin(
            F.broadcast(df.groupBy().agg(F.count("*").alias("_tot")))
        )
        tot_col, drop_tot = F.col("_tot"), True
    q = F.floor(tot_col / n_tiles)
    rem = tot_col % n_tiles
    tile = F.when(
        q == 0,
        # fewer rows than tiles: ntile degenerates to the rank itself
        F.col("_grank"),
    ).otherwise(
        F.when(
            F.col("_grank") <= (q + 1) * rem,
            F.ceil(F.col("_grank") / (q + 1)),
        ).otherwise(rem + F.ceil((F.col("_grank") - (q + 1) * rem) / q))
    )
    out_df = ranked.withColumn(out, tile.cast("int")).drop("_grank")
    return out_df.drop("_tot") if drop_tot else out_df
