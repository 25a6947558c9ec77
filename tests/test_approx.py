"""Accuracy bounds for the approximate/sketch operators vs their exact
twins — the check the DuckDB oracle cannot do (sketch internals are
engine-specific, so the driver only row-counts them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_kinesis_example_spark.catalog import load
from zio_kinesis_example_spark.registry import all_specs

from .conftest import SF_SMALL


def test_approx_percentile_within_bounds(spark):
    # the query now evaluates its own bound (|approx − exact| ≤ 1% rel)
    # and emits one boolean per quantile — assert every bound holds, and
    # independently that the raw sketch tracks the exact percentile
    rows = all_specs()["q_agg_approx_pct"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.p50_ok and r.p90_ok and r.p99_ok, r
    row = (
        load(spark, SF_SMALL, "lineitem")
        .agg(
            F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(10000))
            .alias("a"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("e"),
        )
        .first()
    )
    assert abs(row.a - row.e) / max(abs(row.e), 1e-9) < 0.05


def test_approx_count_distinct_within_bounds(spark):
    e = load(spark, SF_SMALL, "events")
    row = e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.1
