"""Round-14 optimization invariants.

Each test pins a PLAN-SHAPE or cost-model property an r14 optimization
(or ADVICE-r13 fix) established; measurements live in
OPTIMIZATION_r14.md. Values are covered by the oracle parity suite —
these only guard against silent regressions of the structural fixes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zio_kinesis_example_spark.operators.exact import spread_scan


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")


def test_spread_scan_never_executes_an_adaptive_plan(spark):
    """ADVICE r13 (medium): on an AQE-wrapped frame (any upstream
    exchange/subquery) spread_scan must be a NO-OP decided from static
    plan info — a .rdd probe there forces getFinalPhysicalPlan(),
    eagerly running every upstream shuffle stage at plan-BUILD time
    without reuse by the real query. Pin both halves: same object back,
    and the adaptive plan still unexecuted (isFinalPlan=false)."""
    a = spark.range(100).select(F.col("id").alias("k"))
    b = spark.range(100).select(F.col("id").alias("k"))
    joined = a.join(b, "k").groupBy((F.col("k") % 10).alias("g")).count()
    out = spread_scan(joined)
    assert out is joined
    plan = _explain(out)
    assert "AdaptiveSparkPlan" in plan  # the hazard case was exercised
    assert "isFinalPlan=false" in plan  # ...and nothing was executed


def test_shuffle_partitions_falls_back_on_non_numeric_conf(spark):
    """ADVICE r13 (low): a non-integer spark.sql.shuffle.partitions
    (e.g. "auto" under a platform's auto-optimized shuffle) must fall
    back to defaultParallelism instead of raising ValueError. Vanilla
    Spark validates the conf as an int at set-time, so the non-numeric
    case is exercised through a stub session."""
    from zio_kinesis_example_spark.api import _shuffle_partitions

    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    class _Conf:
        def get(self, k):
            return "auto"

    class _Stub:
        conf = _Conf()
        sparkContext = spark.sparkContext

    assert _shuffle_partitions(_Stub()) == \
        spark.sparkContext.defaultParallelism
