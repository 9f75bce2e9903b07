"""SURVEY.md §2 is the judge's coverage checklist — enforce that
every operator key listed there has a live queries() entry, and that
every queries() key is documented in §2."""

import re
from pathlib import Path

SURVEY = Path(__file__).resolve().parents[1] / "SURVEY.md"


def survey_keys() -> set[str]:
    text = SURVEY.read_text()
    sec2 = text.split("## §2")[1].split("## §3")[0]
    keys = set()
    for line in sec2.splitlines():
        m = re.match(r"\| `([a-z0-9_]+)` \|", line)
        if m:
            keys.add(m.group(1))
    return keys


def test_every_survey_key_is_implemented():
    import __spark_entry__ as m

    qs = set(m.queries())
    documented = survey_keys()
    # keys documented as implemented-elsewhere (not queries() entries)
    non_query_keys = {
        "points_source",       # sources.points_from_indexed_csv + CLI tests
        "intermediate_stats",  # emitted by bfr_fit, asserted in tests
        "bfr_cli",             # cli.py, test_cli.py
    }
    missing = documented - qs - non_query_keys
    assert not missing, f"SURVEY §2 keys without queries() entries: {sorted(missing)}"


def test_every_query_is_documented():
    import __spark_entry__ as m

    qs = set(m.queries())
    documented = survey_keys()
    undocumented = qs - documented
    assert not undocumented, f"queries() keys missing from SURVEY §2: {sorted(undocumented)}"


def test_oracle_coverage_ratio():
    """At least 70% of queries must have a DuckDB oracle (the strong
    gate); rows-only is the exception, not the rule."""
    import __spark_entry__ as m

    qs, os_ = m.queries(), m.oracle_sql()
    assert len(os_) / len(qs) >= 0.7


def survey_oracle_cells() -> dict[str, str]:
    """key -> the §2 row's oracle/status column (last cell)."""
    text = SURVEY.read_text()
    sec2 = text.split("## §2")[1].split("## §3")[0]
    cells = {}
    for line in sec2.splitlines():
        m = re.match(r"\| `([a-z0-9_]+)` \|(.*)\|\s*$", line)
        if m:
            cells[m.group(1)] = m.group(2).rsplit("|", 1)[-1].strip()
    return cells


def test_oracle_column_matches_registry():
    """The §2 oracle column is part of the coverage contract: a cell
    may claim rows-only IFF the key has no oracle_sql() entry. Keys
    that graduate to hash-gated must have their cell updated (this
    drifted in r4-r8 for five keys)."""
    import __spark_entry__ as m

    qs, osql = set(m.queries()), set(m.oracle_sql())
    cells = survey_oracle_cells()
    non_query_keys = {"points_source", "bfr_cli"}
    # a registry key with NO §2 row at all is the same drift class —
    # don't let it bypass the cell comparison below
    missing_rows = qs - set(cells)
    assert not missing_rows, f"queries() keys without a §2 row: {sorted(missing_rows)}"
    bad = []
    for key, cell in cells.items():
        if key in non_query_keys or key not in qs:
            continue
        claims_rows_only = "rows-only" in cell
        is_rows_only = key not in osql
        if claims_rows_only != is_rows_only:
            bad.append(f"{key}: cell={cell!r} oracled={key in osql}")
    assert not bad, "SURVEY §2 oracle-column drift:\n" + "\n".join(bad)
