"""Driver-sample rotation coverage report (r11, VERDICT item 2).

The external driver gates a ~50-key prefix of ``queries()`` per
round (CORRECTNESS_r{N}.json). The registry fronts that prefix by a
tier scheduler (plans/__init__.all_queries): changed-this-round keys
first, then never-sampled, red, graduating, and finally everything
else STALEST-FIRST. This tool makes the rotation's coverage
PROVABLE rather than asserted:

1. per-round sample sizes and the union coverage of every trailing
   window, including the smallest window that reaches full coverage;
2. the forward guarantee, checked exactly: among tier-5 (steady
   state) keys, NO key outside the current first-PREFIX positions is
   staler than a tier-5 key inside it — i.e. the prefix the driver
   will sample next round is precisely the least-recently-sampled
   set, so any key's staleness is bounded by
   ceil(N / PREFIX) + (tier-0..4 slots) rounds going forward.

Exit 1 if the LRU invariant is violated. tests/test_rotation.py runs
the same checks in the suite.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

PREFIX = 50  # driver per-round sample size (observed r1-r10: 50)

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir)


def load_samples(root: str = ROOT) -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", p).group(1))
        try:
            with open(p) as f:
                out[rnd] = set(json.load(f))
        except Exception:
            continue
    return out


def last_sampled(samples: dict[int, set[str]]) -> dict[str, int]:
    """key -> newest round in which the driver sampled it (absent =
    never sampled)."""
    seen: dict[str, int] = {}
    for rnd in sorted(samples):
        for k in samples[rnd]:
            seen[k] = rnd
    return seen


def check(verbose: bool = True) -> list[str]:
    sys.path.insert(0, ROOT)
    import __spark_entry__ as m
    from bfr_clustering_using_pyspark_spark.plans import (
        _CHANGED_THIS_ROUND,
        _CONVERTED_THIS_ROUND,
    )

    keys = list(m.queries())
    samples = load_samples()
    rounds = sorted(samples)
    seen = last_sampled(samples)
    problems: list[str] = []

    if verbose:
        print(f"registry keys: {len(keys)}; artifacts: r{rounds[0]}-r{rounds[-1]}")
        for r in rounds:
            print(f"  r{r}: {len(samples[r])} keys sampled")

    # trailing-window coverage
    full_at = None
    for w in range(1, len(rounds) + 1):
        u = set().union(*(samples[r] for r in rounds[-w:]))
        cov = len([k for k in keys if k in u])
        if verbose:
            print(f"window r{rounds[-w]}-r{rounds[-1]}: union {len(u)} -> {cov}/{len(keys)} covered")
        if cov == len(keys) and full_at is None:
            full_at = w
    never = [k for k in keys if k not in seen]
    if verbose:
        print(f"full coverage at trailing window: {full_at} rounds; never-sampled: {never or 'none'}")

    # forward LRU invariant: the current prefix must contain the
    # stalest steady-state keys. Tier 0-4 keys are exempt (they are
    # priority overrides by design, and they are themselves sampled).
    override = set(_CHANGED_THIS_ROUND) | set(_CONVERTED_THIS_ROUND) | set(never)
    pos = {k: i for i, k in enumerate(keys)}
    t5_in = [k for k in keys[:PREFIX] if k not in override]
    t5_out = [k for k in keys[PREFIX:] if k not in override]
    worst_in = max((seen.get(k, -1) for k in t5_in), default=-1)
    for k in t5_out:
        if seen.get(k, -1) < worst_in:
            problems.append(
                f"LRU violation: {k} (last sampled r{seen.get(k, -1)}, pos {pos[k]}) "
                f"is staler than an in-prefix tier-5 key (newest in-prefix r{worst_in})"
            )
    if verbose:
        stale_out = sorted(t5_out, key=lambda k: seen.get(k, -1))[:5]
        print(
            f"prefix({PREFIX}): {len(override & set(keys[:PREFIX]))} override + "
            f"{len(t5_in)} LRU keys (stalest in-prefix round <= r{worst_in}); "
            f"next-stalest outside: {[(k, seen.get(k)) for k in stale_out]}"
        )
        ceil_rounds = -(-len(keys) // PREFIX)
        print(
            f"forward bound: every key re-sampled within ~{ceil_rounds}+ rounds "
            f"(N={len(keys)}, prefix={PREFIX}, plus tier-0..4 slots)"
        )
        print("LRU invariant:", "OK" if not problems else f"{len(problems)} violations")
    return problems


if __name__ == "__main__":
    raise SystemExit(1 if check() else 0)
