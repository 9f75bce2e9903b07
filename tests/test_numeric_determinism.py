"""Guardrails for the fixed-point determinism policy.

Two cross-engine divergence classes broke hash parity in the past:
order-dependent double summation, and round(x, k>=1) tie handling
(Spark rounds the shortest decimal repr, numeric engines round the
scaled binary). The policy: per-row scale-0 round to integer units,
exact BIGINT sums, one final division — `functions/numeric.py` on
the Spark side, `sum(CAST(round(x * 1eK) AS BIGINT)) / 1eK` in the
oracle SQL (1eN literals, because plain decimals parse as DECIMAL in
Spark SQL and change result types for the SQL-API parity suite).

These tests (a) unit-check the helpers, (b) lint every registered
oracle for reintroductions of the unsafe patterns.
"""

from __future__ import annotations

import re

import pytest

# ---------------------------------------------------------------- helpers


def _units(x: float, scale: int) -> int:
    """Round-half-away-from-zero on the computed double product —
    exactly what both Spark (BigDecimal HALF_UP on the shortest repr)
    and DuckDB (away-from-zero) do at scale 0, where every exact .5
    tie is a representable double so the engines cannot disagree."""
    import math

    p = x * float(10**scale)
    return int(math.floor(p + 0.5)) if p >= 0 else int(math.ceil(p - 0.5))


def test_fixed_sum_matches_cents_semantics(spark, duck):
    from pyspark.sql import functions as F

    from bfr_clustering_using_pyspark_spark.functions.numeric import (
        fixed_avg,
        fixed_point,
        fixed_sum,
    )

    xs = [1.005, 2.675, -3.335, 0.01]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    row = df.agg(
        fixed_sum(F.col("x")).alias("s"),
        fixed_avg(F.col("x")).alias("a"),
        fixed_sum(F.col("x"), 4).alias("s4"),
    ).collect()[0]
    cents = [_units(x, 2) for x in xs]
    assert row["s"] == pytest.approx(sum(cents) / 100.0)
    assert row["a"] == pytest.approx(_units(sum(cents) / len(xs), 0) / 100.0)
    assert row["s4"] == pytest.approx(sum(_units(x, 4) for x in xs) / 10000.0)

    # the oracle-SQL shape produces the identical value in DuckDB
    duck_s = duck.execute(
        "SELECT sum(CAST(round(x * 1e2) AS BIGINT)) / 1e2 FROM (VALUES "
        + ",".join(f"({x!r})" for x in xs)
        + ") t(x)"
    ).fetchone()[0]
    assert duck_s == row["s"]

    one = spark.range(1).select(fixed_point(F.lit(2.675)).alias("p")).collect()[0]
    # 2.675 * 100.0 is EXACTLY 267.5 in IEEE double → a representable
    # tie → both engines round away from zero → 2.68 everywhere.
    # (round(2.675, 2) by contrast is engine-dependent: Spark rounds
    # the shortest repr "2.675" up, numeric engines see 267.4999…)
    assert one["p"] == _units(2.675, 2) / 100.0 == 2.68


def test_fixed_sum_null_and_negative(spark):
    from pyspark.sql import functions as F

    from bfr_clustering_using_pyspark_spark.functions.numeric import fixed_sum

    df = spark.createDataFrame([(None,), (-0.005,), (None,)], "x double")
    row = df.agg(fixed_sum(F.col("x")).alias("s")).collect()[0]
    # nulls ignored; -0.005*100 = -0.5 exactly -> away from zero -> -1
    assert row["s"] == -0.01


def test_fixed_sum_cross_engine_randomized(spark, duck):
    """The actual cross-engine contract, fuzzed: Spark fixed_sum /
    fixed_avg must produce bit-identical doubles to the documented
    DuckDB oracle shapes on adversarial inputs — exact half-cent
    ties, near-tie decimals, negatives, and uniform noise."""
    import random

    from pyspark.sql import functions as F

    from bfr_clustering_using_pyspark_spark.functions.numeric import fixed_avg, fixed_sum

    rng = random.Random(20260814)
    xs = []
    for _ in range(400):
        kind = rng.randrange(4)
        if kind == 0:  # exact half-cent ties (X.XX5 with dyadic reprs mixed in)
            xs.append((rng.randrange(-10**6, 10**6) * 2 + 1) / 2000.0)
        elif kind == 1:  # classic non-representable tie decimals
            xs.append(rng.randrange(-10**4, 10**4) + rng.randrange(1000) / 1000.0 + 0.0005)
        elif kind == 2:  # plain cents
            xs.append(rng.randrange(-10**8, 10**8) / 100.0)
        else:  # uniform noise
            xs.append(rng.uniform(-5e4, 5e4))
    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    srow = sdf.agg(
        fixed_sum(F.col("x")).alias("s"), fixed_avg(F.col("x")).alias("a")
    ).collect()[0]
    values = ",".join(f"({x!r})" for x in xs)
    orow = duck.execute(
        f"SELECT sum(CAST(round(x * 1e2) AS BIGINT)) / 1e2 AS s, "
        f"CAST(round(sum(CAST(round(x * 1e2) AS BIGINT)) * 1e0 / count(x)) AS BIGINT) / 1e2 AS a "
        f"FROM (VALUES {values}) t(x)"
    ).fetchone()
    # bit-exact, not approx — this is the hash-gate contract
    assert srow["s"] == orow[0]
    assert srow["a"] == orow[1]


def test_half_away_negative_ties():
    from bfr_clustering_using_pyspark_spark.streaming.events_stream import _half_away

    assert _half_away(0.5) == 1.0
    assert _half_away(-0.5) == -1.0
    assert _half_away(2.5) == 3.0
    assert _half_away(-2.5) == -3.0
    assert _half_away(-333.49999999999994) == -333.0
    assert _half_away(0.0) == 0.0


# ---------------------------------------------------------------- oracle lint

# round(sum(...)) over doubles is order-dependent; round(<expr>,
# k>=1) is tie-divergent EVEN for int/int ratios (107/40 = 2.675
# exactly), so round(avg(...)) is forbidden outright — use
# fixed_avg/fixed_avg_int. round(sum(...)) is allowed only when the
# summed column is integer-valued (exact, order-free sums) AND the
# surrounding expression is the scale-0 `round(sum(x) * 1eK / ...)`
# shape or a plain passthrough of an already-exact value.
_INT_VALUED = (
    r"l_quantity|n_orders|n_events|n_tokens|n_chars|new_session|cnt|"
    r"count|\bn\b|\bt\b|steps?|c_custkey|grouping|rank\(\)|"
    r"CASE WHEN bucket|date_diff\(|coalesce\(n_orders|"
    r"CAST\(json_extract_string|c\) \*|is_boiler|pad_t"  # pad_t:
    # greatest(BUDGET - bin_tokens, 0) — integer by construction
    # (seq_pack_eval)
)

# keys whose round(sum(...)) hits were hand-vetted as exact-int
_VETTED_KEYS = {
    "q_mv_rollup",      # round(sum(c) * 1e2 / count) — c is BIGINT cents
}

_ROUND_AGG = re.compile(r"round\s*\(\s*(sum|avg)\s*\(", re.IGNORECASE)
_ROUND_AVG = re.compile(r"round\s*\(\s*avg\s*\(", re.IGNORECASE)


def _oracles():
    import __spark_entry__ as m

    return m.oracle_sql()


@pytest.mark.parametrize("name,sql", sorted(_oracles().items()))
def test_oracle_has_no_unsafe_round_aggregate(name, sql):
    """No oracle may round a double sum/avg directly — every hit must
    either aggregate an integer-valued column or use the fixed-point
    pattern (round happens per-row before the sum, or at scale 0 on a
    ratio of exact integers)."""
    assert not _ROUND_AVG.search(sql), (
        f"{name}: `round(avg(...), k)` is tie-divergent across engines even "
        f"for integer ratios (107/40 = 2.675 exactly) — use the "
        f"fixed_avg/fixed_avg_int shapes from functions/numeric.py"
    )
    if name in _VETTED_KEYS:
        return
    for m in _ROUND_AGG.finditer(sql):
        # the argument of the offending sum()/avg()
        tail = sql[m.end() : m.end() + 120]
        assert re.match(_INT_VALUED, tail.strip(), re.IGNORECASE) or re.match(
            r"CAST\s*\(\s*round", tail.strip(), re.IGNORECASE
        ) or "CASE WHEN" in tail[:40], (
            f"{name}: `round({m.group(1)}(...)` over a non-integer expression "
            f"is order/tie-divergent across engines — use the fixed-point "
            f"integer-unit pattern (functions/numeric.py docstring). "
            f"Offending fragment: round({m.group(1)}({tail[:60]}..."
        )


@pytest.mark.parametrize("name,sql", sorted(_oracles().items()))
def test_oracle_divides_bigint_by_double_literal(name, sql):
    """Wherever an oracle divides a BIGINT-sum by a unit constant, the
    constant must be a 1eN literal (DOUBLE in both Spark SQL and
    DuckDB) — `/ 100.0` parses as DECIMAL division in Spark SQL and
    flips the result type for the SQL-API parity suite."""
    assert not re.search(r"AS BIGINT\)\)?\s*/\s*1?0+\.0", sql), (
        f"{name}: BIGINT / <decimal literal> — use a 1eN literal instead"
    )
    assert not re.search(r"\*\s*1\.0\b", sql), (
        f"{name}: `* 1.0` is a DECIMAL literal in Spark SQL — use `* 1e0`"
    )
