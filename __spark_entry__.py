"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``zio_kinesis_example_spark`` package; this
module adapts the registry to the driver's calling convention.

Serve order: the driver's per-round correctness pass is budgeted (it has
stopped at 50 queries per round), so this adapter — the harness side, not
the library — orders the registry so the budget lands where it matters:

1. queries with no green row yet in any ``CORRECTNESS_r*.json`` at the
   repo root (never attempted, crashed, mismatched, or newly given an
   oracle after a rows-only round);
2. oracle-less queries whose latest row is a rows-only pass (re-confirm);
3. hash-green queries, stalest round first.

The verified set is read from the artifacts themselves each run, so it
never goes stale as queries are added, renamed, or fixed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from zio_kinesis_example_spark.registry import all_specs  # noqa: E402


@lru_cache(maxsize=1)
def _verification_state() -> dict[str, tuple[int, str]]:
    """name -> (round, status) from its latest CORRECTNESS_r*.json row.

    status ∈ {"green", "rows_only", "failed"}: a hash-match is green, a
    rows-only row (driver records err="no_oracle" with spark_rows set) is
    rows_only, anything else (exception, mismatch) is failed.

    Cached per process: the artifacts are immutable within one driver run,
    and both ``queries()`` and ``oracle_sql()`` need the same snapshot.
    """
    state: dict[str, tuple[int, str]] = {}
    for p in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                status = "green"
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                status = "rows_only"
            else:
                status = "failed"
            prev = state.get(name)
            if prev is None or rnd >= prev[0]:
                state[name] = (rnd, status)
    return state


def _serve_order() -> list[str]:
    specs = all_specs()
    # Drop state rows for names no longer in the registry: stale artifacts
    # from renamed/retired queries must not pin hash-green (group-2) slots
    # or shadow a successor query's unseen status.
    state = {n: v for n, v in _verification_state().items() if n in specs}
    idx = {n: i for i, n in enumerate(specs)}

    def key(n: str):
        rnd, status = state.get(n, (0, "unseen"))
        if status == "green":
            group = 2
        elif status == "rows_only" and specs[n].oracle is None:
            group = 1
        else:
            # unseen, failed, or a rows-only query that has since gained an
            # oracle (its hash row is still missing) — verify first.
            group = 0
            rnd = 0
        return (group, rnd, idx[n])

    return sorted(specs, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary, SURVEY.md §7 step 1)
    on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["q_agg_group"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, served
    unverified-first (see module docstring)."""
    specs = all_specs()
    return {n: specs[n].fn for n in _serve_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; approximate/engine-hash
    queries are omitted (driver falls back to rows-only checks)."""
    specs = all_specs()
    return {
        n: specs[n].oracle
        for n in _serve_order()
        if specs[n].oracle is not None
    }
