"""Accuracy bounds for the approximate/sketch operators vs their exact
twins — the check the DuckDB oracle cannot do (sketch internals are
engine-specific, so the driver only row-counts them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_kinesis_example_spark.catalog import load
from zio_kinesis_example_spark.registry import all_specs

from .conftest import SF_SMALL


def test_approx_percentile_within_bounds(spark):
    approx = {
        r.l_returnflag: r.pct_approx
        for r in all_specs()["q_agg_approx_pct"].fn(spark, SF_SMALL).collect()
    }
    exact = {
        r.l_returnflag: (r.p50, r.p90, r.p99)
        for r in load(spark, SF_SMALL, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, (a50, a90, a99) in approx.items():
        e50, e90, e99 = exact[flag]
        for a, e in ((a50, e50), (a90, e90), (a99, e99)):
            assert abs(a - e) / max(abs(e), 1e-9) < 0.05, (flag, a, e)


def test_approx_count_distinct_within_bounds(spark):
    e = load(spark, SF_SMALL, "events")
    row = e.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.countDistinct("user_id").alias("exact"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.1
