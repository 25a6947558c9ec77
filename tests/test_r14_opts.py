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


def test_largestar_round_algebra(spark):
    """r14 large-star rewrite: with every stored edge (u, v) satisfying
    u > v, one round's output {(u, m(v))} (m(v) = min down-neighbor of
    v, else v) must equal the classic union + closed-neighborhood-min +
    filter formulation — on a graph with chains, hubs, and isolated
    big-ends."""
    edges = [(9, 1), (9, 5), (5, 2), (4, 2), (3, 1), (2, 1), (8, 7),
             (7, 6), (11, 10)]
    e = spark.createDataFrame(edges, "u long, v long")
    nbrs = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    lmins = nbrs.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m"))
    old = (
        nbrs.join(lmins, "u").filter(F.col("v") > F.col("u"))
        .select(F.greatest("v", "m").alias("u"),
                F.least("v", "m").alias("v")).distinct())
    dmin = e.groupBy("u").agg(F.min("v").alias("m"))
    new = (
        e.join(dmin.select(F.col("u").alias("v"), "m"), "v", "left")
        .select("u", F.coalesce("m", F.col("v")).alias("v")).distinct())
    assert sorted(map(tuple, old.collect())) == \
        sorted(map(tuple, new.collect()))


def test_pagerank_round_joins_halved(spark):
    """r14 pagerank rewrite: outdeg rides the cached edge list
    (edges_deg), so the 5-round optimized plan carries exactly ONE
    logical Join per round — the old shape's extra pr-deg join per
    round (10 Join nodes total) is gone."""
    import re

    from zio_kinesis_example_spark.operators.analytics import _PR_ITERS
    from zio_kinesis_example_spark.registry import all_specs

    df = all_specs()["q_graph_pagerank"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert len(re.findall(r"\bJoin\b", plan)) == _PR_ITERS
    from zio_kinesis_example_spark.api import clear_shared_cache
    clear_shared_cache()


def test_persist_if_big_fires_only_above_floor(spark):
    """r14 conditional persist (VERDICT r13 #2): below the size floor
    the events-family plans carry NO InMemoryRelation (the local bench
    path is byte-identical to r13); with the floor forced to 1 byte
    every multi-consumer frame persists and the plan reads caches."""
    from zio_kinesis_example_spark.api import clear_shared_cache
    from zio_kinesis_example_spark.registry import all_specs

    sf = "/root/testdata/sf0.001"
    fn = all_specs()["q_funnel"].fn
    plan_default = fn(spark, sf)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "InMemoryRelation" not in plan_default
    old = spark.conf.get("spark.zke.persist.minInputBytes", None)
    spark.conf.set("spark.zke.persist.minInputBytes", "1")
    try:
        plan_forced = fn(spark, sf)._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert "InMemoryRelation" in plan_forced
        # values are persist-invariant
        a = sorted(map(tuple, fn(spark, sf).collect()))
        clear_shared_cache()
    finally:
        if old is None:
            spark.conf.unset("spark.zke.persist.minInputBytes")
        else:
            spark.conf.set("spark.zke.persist.minInputBytes", old)
    b = sorted(map(tuple, fn(spark, sf).collect()))
    assert a == b
    clear_shared_cache()


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
