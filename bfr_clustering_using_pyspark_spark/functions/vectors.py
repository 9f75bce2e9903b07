"""Vector column functions — pure `pyspark.sql.functions`
compositions (JVM-evaluated, codegen-friendly; no Python UDFs).

These are the building blocks the similarity/dedup operators use;
kept here so every operator computes dot/norm/cosine identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col) -> Column:
    """Cast array<float>/array<int> → array<double> (do this before
    any arithmetic so results match engines computing in double)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
