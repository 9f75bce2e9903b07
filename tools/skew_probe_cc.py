"""Hot-component probe for connected components (r11, VERDICT item
6): q_skew_join measures hot JOIN keys; this measures the hot
COMPONENT shape — 90% of all edges in ONE deep component (a chain,
the adversarial diameter case) plus a sparse random remainder.

What it demonstrates, measured:
- min-label propagation needs diameter rounds, so the chain
  component exhausts ``max_rounds`` at x10/x30 and the labels would
  still be moving — the r11 auto-switch detects the non-convergence
  and falls back to ``connected_components_star`` (O(log n) rounds);
- the star face's round count grows ~log(chain length), so the hot
  component costs log-, not linear-, many shuffles.

Usage: python tools/skew_probe_cc.py [multipliers...]  # default 1 10 30
Prints one row per (multiplier, face): rounds proxy + wall seconds +
component count, and asserts both faces agree with driver union-find.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

BASE_CHAIN = 400  # x1 chain length (diameter ~400 >> max_rounds 16)
BASE_RANDOM = 45  # x1 random sparse edges (~10% of total)


def build_pairs(spark, k: int):
    import numpy as np
    import pandas as pd

    n_chain = BASE_CHAIN * k
    n_rand = BASE_RANDOM * k
    rng = np.random.default_rng(13)
    chain = pd.DataFrame(
        {"doc_a": np.arange(n_chain - 1, dtype=np.int64),
         "doc_b": np.arange(1, n_chain, dtype=np.int64)}
    )
    # sparse random pairs over a DISJOINT id range (small components)
    lo = n_chain + 10
    a = lo + rng.integers(0, n_rand * 4, n_rand)
    b = lo + rng.integers(0, n_rand * 4, n_rand)
    rnd = pd.DataFrame({"doc_a": np.minimum(a, b), "doc_b": np.maximum(a, b)})
    rnd = rnd[rnd.doc_a != rnd.doc_b]
    pdf = pd.concat([chain, rnd], ignore_index=True)
    return spark.createDataFrame(pdf), pdf


def truth_components(pdf) -> dict:
    from bfr_clustering_using_pyspark_spark.operators.dedup import (
        uf_labels,
        uf_union,
    )

    parent: dict = {}
    for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
        uf_union(parent, int(a), int(b))
    return dict(uf_labels(parent))


def main() -> int:
    from bfr_clustering_using_pyspark_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )
    from bfr_clustering_using_pyspark_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark("skew_probe_cc")
    rc = 0
    for k in mults:
        pairs, pdf = build_pairs(spark, k)
        truth = truth_components(pdf)
        for face, fn in (
            ("auto(prop->star)", lambda p: connected_components(p, small_gate=0)),
            ("star", connected_components_star),
        ):
            t0 = time.time()
            got = {r[0]: r[1] for r in fn(pairs).collect()}
            dt = time.time() - t0
            ok = got == truth
            print(
                f"x{k:<3} {face:<18} edges={len(pdf):>6} chain={BASE_CHAIN*k:>6} "
                f"wall={dt:6.1f}s comps={len(set(got.values())):>5} match={ok}"
            )
            if not ok:
                rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
