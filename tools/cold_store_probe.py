"""Price the warehouse artifact stores' COLD build path (r15 verdict
item 7): the default bench times whatever state the stores are in —
usually the hit path, because any earlier process built them — so the
cold build cost was structurally invisible to BENCH round-over-round.

This probe, run once per round on a quiet host:

1. moves the named stores aside (never deletes the live artifacts
   until the probe succeeds),
2. times the keys that ride them with the store EMPTY (cold build),
3. times the same keys again in a SECOND fresh session (warm hit —
   the path the bench normally measures), and
4. prints ONE JSON line with both numbers per key, then restores
   nothing (the cold run rebuilt the stores; the moved-aside copies
   are deleted on success, restored on failure).

The default bench's timed region is untouched — this is a separate
artifact, committed as COLD_STORE_r{N}.json.

Usage: python tools/cold_store_probe.py [SF_DIR]
"""

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WAREHOUSE = os.path.join(ROOT, "spark-warehouse")
# store dir -> the keys whose first call pays its build
STORES = {
    "nnd_index": ["ann_nndescent_graph", "ann_graph_search"],
    "minhash_sigs": ["dedup_minhash_lsh"],
}

_CHILD = """
import json, os, sys, time
sys.path.insert(0, %(root)r)
os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
from bfr_clustering_using_pyspark_spark.session import get_spark
from bfr_clustering_using_pyspark_spark.plans import all_queries
spark = get_spark("cold_store_probe")
spark.sparkContext.setLogLevel("OFF")
sf_dir = %(sf_dir)r
spark.read.parquet(f"{sf_dir}/region.parquet").count()
qs = all_queries()
out = {}
for k in %(keys)r:
    t0 = time.time()
    n = qs[k](spark, sf_dir).count()
    out[k] = {"sec": round(time.time() - t0, 3), "rows": n}
print("JSON:" + json.dumps(out))
spark.stop()
"""


def _run_session(sf_dir: str, keys: list[str]) -> dict:
    code = _CHILD % {"root": ROOT, "sf_dir": sf_dir, "keys": keys}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=ROOT
    )
    for line in proc.stdout.splitlines():
        if line.startswith("JSON:"):
            return json.loads(line[5:])
    raise RuntimeError(
        f"probe session failed rc={proc.returncode}:\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = sorted({k for ks in STORES.values() for k in ks})
    aside: list[tuple[str, str]] = []
    try:
        for store in STORES:
            d = os.path.join(WAREHOUSE, store)
            if os.path.isdir(d):
                a = f"{d}.probe-aside-{os.getpid()}"
                os.rename(d, a)
                aside.append((d, a))
        t0 = time.time()
        cold = _run_session(sf_dir, keys)
        cold_wall = round(time.time() - t0, 3)
        t0 = time.time()
        warm = _run_session(sf_dir, keys)
        warm_wall = round(time.time() - t0, 3)
        print(
            json.dumps(
                {
                    "metric": "warehouse_cold_vs_hit",
                    "sf_dir": sf_dir,
                    "stores": sorted(STORES),
                    "cold_build": cold,
                    "warm_hit": warm,
                    "cold_session_wall": cold_wall,
                    "warm_session_wall": warm_wall,
                }
            )
        )
    except BaseException:
        # put the originals back so a failed probe leaves the
        # warehouse exactly as found
        for d, a in aside:
            shutil.rmtree(d, ignore_errors=True)
            os.rename(a, d)
        raise
    else:
        for _d, a in aside:
            shutil.rmtree(a, ignore_errors=True)


if __name__ == "__main__":
    main()
