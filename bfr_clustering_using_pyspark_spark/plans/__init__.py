"""Declarative query plans (the analytics surface).

Each module exposes ``QUERIES: dict[name -> fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[name -> duckdb-runnable SQL]`` for
the correctness gate. Computed columns are aliased identically on
both sides (the gate hashes values after sorting columns by name).
"""

from ..operators import all_oracles as _op_oracles
from ..operators import all_queries as _op_queries
from .. import streaming as _streaming
from . import events, ml_queries, tpch, tpch_ext

_MODULES = (tpch, tpch_ext, events, ml_queries)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    out.update(_op_queries())
    out.update(_streaming.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    out.update(_op_oracles())
    out.update(_streaming.ORACLES)
    return out
