"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``zio_kinesis_example_spark`` package; this
module just adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zio_kinesis_example_spark.registry import (  # noqa: E402
    ORACLES as _oracles,
    QUERIES as _queries,
    all_specs,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary, SURVEY.md §7 step 1)
    on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["q_agg_group"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; approximate/engine-hash
    queries are omitted (driver falls back to rows-only checks)."""
    return _oracles()
