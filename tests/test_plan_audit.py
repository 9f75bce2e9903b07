"""Per-round plan-audit gate: run tools/explain_audit.py's full
registry walk (per-key exchange/pushdown/broadcast/codegen budgets
where defined, plus the universal heavy-kernel-in-Filter,
grouped-pandas-width, and unpartitioned-window checks on EVERY plan)
at sf0.001. A clean HEAD has zero failures AND zero warns — every
known-benign site must be whitelisted with a justification, so the
next silent recompute defect (the class that cost corpus_curate 4x
its lineage in r9) fails the suite instead of waiting for a manual
sweep."""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

# Derive the audit corpus from the env (same var bench.py honours)
# so the suite degrades to a skip — not a collection-time hard fail —
# on machines without the driver's fixture layout.
SF_AUDIT = os.environ.get(
    "SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_AUDIT),
    reason=f"audit corpus {SF_AUDIT} not present on this machine",
)


def test_full_registry_plan_audit(spark):
    from explain_audit import run_audit

    failures, warns = run_audit(spark, sf_dir=SF_AUDIT, verbose=False)
    assert not failures, f"plan-audit budget failures: {failures}"
    assert not warns, f"unwhitelisted plan warns: {warns}"
