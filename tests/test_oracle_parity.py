"""The local correctness gate: every registered query vs its DuckDB oracle
at sf0.001 (the driver repeats this at sf0.01 — SURVEY.md §5 strategy 1)."""

from __future__ import annotations

import pytest

from zio_kinesis_example_spark.registry import all_specs
from zio_kinesis_example_spark.tools.oracle import compare_one, duckdb_connection

from .conftest import SF_SMALL

_NAMES = sorted(all_specs())


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_SMALL)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(spark, duck, name):
    res = compare_one(spark, duck, name, SF_SMALL)
    assert res.ok, f"{name}: {res.detail}"
    if all_specs()[name].oracle is None:
        # rows-only path: at least assert the query runs deterministically
        again = compare_one(spark, duck, name, SF_SMALL)
        assert again.spark_rows == res.spark_rows
