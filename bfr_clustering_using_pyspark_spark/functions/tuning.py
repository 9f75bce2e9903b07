"""Scoped shuffle-width tuning for iterative operators.

Several iterative operators (connected components, PageRank, label
propagation, NN-Descent, streaming folds) size their per-round shuffle
width to the *materialized* working-set row count instead of the
deployment default: a graph round only ever shuffles O(edges) rows, so
running it at a 100 TB deployment's multi-thousand-partition width
wastes scheduler overhead on empty partitions.

``scoped_shuffle_width`` is the ONE sanctioned way to do the swap.

INVARIANT (enforced by construction, documented here once instead of
at six call sites): ``spark.sql.shuffle.partitions`` is session-global
state, so every Spark action that should run at the narrowed width
must execute EAGERLY inside the ``with`` block (``localCheckpoint
(eager=True)``, ``.count()``, ``.write``, collect-to-driver).  A frame
built inside the block but executed lazily after it escapes the width;
a concurrent job sharing the session would also observe the narrowed
width.  Callers therefore must (a) end every loop round in an eager
materialization, and (b) never hold the scope across a yield to
user code.  All in-repo callers follow (a); the engine is
single-threaded per session by construction.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_CONF = "spark.sql.shuffle.partitions"


def shuffle_width(spark: SparkSession) -> int:
    """The session shuffle width as an int, guarded: platforms that
    support it may set ``spark.sql.shuffle.partitions`` to a
    non-numeric value (e.g. ``auto``), and a bare ``int(...)`` crash
    inside a ``foreachBatch`` fails the whole drain (ADVICE r14).
    Falls back to ``defaultParallelism``, which is always numeric."""
    try:
        return int(spark.conf.get(_CONF))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def sized_width(
    spark: SparkSession,
    n_rows: int,
    rows_per_part: int = 1_000_000,
    floor: int = 8,
) -> int:
    """Shuffle width for an iterative stage that moves ``n_rows`` rows
    per round: ~``rows_per_part`` rows/partition, floored at ``floor``,
    capped at the deployment default so real-scale graphs are
    untouched (the swap only ever NARROWS)."""
    deployed = shuffle_width(spark)
    return min(deployed, max(floor, n_rows // rows_per_part + 1))


@contextmanager
def scoped_shuffle_width(spark: SparkSession, parts: int) -> Iterator[int]:
    """Temporarily set ``spark.sql.shuffle.partitions`` to ``parts``.

    See module docstring for the eager-execution invariant every
    caller must satisfy.  Restores the previous value on exit, even on
    error."""
    prev = spark.conf.get(_CONF)
    spark.conf.set(_CONF, str(parts))
    try:
        yield parts
    finally:
        spark.conf.set(_CONF, prev)
