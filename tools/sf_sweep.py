"""Scale sweep: run the strict gate at a LARGER sf than the driver's
(default sf0.1) over every key whose oracle is tractable there.

The pair-exhaustive oracles (all-pairs Jaccard / containment /
levenshtein ground truths and the recursive-CTE components) are
O(n²) in DuckDB and are compared at <= sf0.01 where exhaustive
ground truth is tractable; this sweep SKIPS their comparison but
still executes their Spark side, so scale-dependent engine bugs
(ANSI divide-by-zero, overflow, saturation) surface everywhere.

Round-5 catch record (what this sweep is for): bloom-oracle
duplicate-bucket undercount, linear-count bitmap saturation, and
round(x,4) decimal-tie divergence — all invisible at sf0.01.

Usage: python tools/sf_sweep.py [sf_dir]
"""

from __future__ import annotations

import subprocess
import sys
import time

# oracle is pair-exhaustive or recursive — comparison stays at sf<=0.01
QUADRATIC_ORACLES = {
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
    "dedup_components",
    "stream_components",
    "dedup_fuzzy_names",
    "dedup_embedding",
    "text_pii_scrub",
    # r10 sf1 finding: the silhouette oracle is an n x n cross join
    # with per-pair list arithmetic — 400M pairs at sf1's 20k vectors
    # ran >15 min in DuckDB (the Spark face finished in seconds)
    "silhouette_eval",
    # r10 sf1 finding: the seq_pack oracle replays the greedy
    # next-fit as a RECURSIVE CTE whose depth is rows-per-shard
    # (6250 at sf1) and whose every iteration rescans the doc table —
    # >70 min of DuckDB CPU at sf1; tractable at <= sf0.1 (625 deep)
    "seq_pack",
}


def _domain_pinned_keys(sf_dir: str) -> set[str]:
    """Keys whose STATIC oracle is pinned to a bounded corpus domain:
    the IVF family's SQL replays exactly N_IVF_LISTS centroids, valid
    up to IVF_SMALL_N vectors (beyond it the Spark face switches to
    the constant 32-list layout and the oracle error()s loudly by
    design). Above the pin, comparison is excluded — documented, not
    skipped silently — and the Spark side still runs."""
    import duckdb

    from bfr_clustering_using_pyspark_spark.operators.similarity import IVF_SMALL_N

    import os

    p = f"{sf_dir}/embeddings.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    n = duckdb.sql(f"SELECT count(*) FROM '{src}'").fetchone()[0]
    if n <= IVF_SMALL_N:
        return set()
    keys = {"ann_ivf", "ann_ivf_rerank", "ann_ivf_partitioned"}
    print(
        f"# oracle-domain exclusion: embeddings n={n} > IVF_SMALL_N"
        f"={IVF_SMALL_N}; {sorted(keys)} run Spark-side only"
    )
    return keys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    skip = QUADRATIC_ORACLES | _domain_pinned_keys(sf_dir)
    keys = [k for k in m.queries() if k not in skip]
    rc = subprocess.run(
        [sys.executable, "tools/check_correctness.py", sf_dir, *keys],
        cwd="/root/repo",
    ).returncode

    # Spark-side-only smoke for the skipped keys: they must still RUN
    from bfr_clustering_using_pyspark_spark.session import get_spark

    spark = get_spark("sf_sweep")
    qs = m.queries()
    spark_rc = 0
    for k in sorted(skip):
        t0 = time.time()
        try:
            n = qs[k](spark, sf_dir).count()
            print(f"SPARK-ONLY OK   {k}: {n} rows [{time.time() - t0:.1f}s]")
        except Exception as e:  # noqa: BLE001
            print(f"SPARK-ONLY FAIL {k}: {str(e)[:200]}")
            spark_rc = 1
    return rc or spark_rc


if __name__ == "__main__":
    raise SystemExit(main())
