"""Semantic edge cases the fixed testdata never exercises: NULL join
keys, empty inputs, and empty-group aggregation — the boundaries where
engines genuinely disagree if the formulation is sloppy."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_kinesis_example_spark import api


def test_null_join_keys_never_match(spark):
    """SQL equi-join semantics: NULL = NULL is unknown, so NULL keys
    produce no matches (inner) and survive unmatched (left)."""
    left = spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k long, v string")
    right = spark.createDataFrame(
        [(1, "x"), (None, "y")], "k long, w string")
    inner = left.join(right, "k")
    assert sorted(r.v for r in inner.collect()) == ["a"]
    left_j = left.join(right, "k", "left")
    got = {r.v: r.w for r in left_j.collect()}
    assert got == {"a": "x", "b": None, "c": None}


def test_empty_input_aggregations(spark):
    """Global agg over empty input yields ONE row (count=0, sum=NULL);
    grouped agg yields ZERO rows — the classic pair of behaviors."""
    empty = spark.createDataFrame([], "k long, x double")
    g = empty.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    row = g.first()
    assert row.n == 0 and row.s is None
    grouped = empty.groupBy("k").agg(F.sum("x"))
    assert grouped.count() == 0


def test_api_ops_on_empty_frames(spark):
    """Library operators must be total: empty inputs produce empty
    outputs, not errors."""
    empty_ev = spark.createDataFrame([], "user long, t timestamp, v long")
    assert api.sessionize(empty_ev, ["user"], "t", 3600).count() == 0
    assert api.dedup_latest(empty_ev, ["user"],
                            [F.col("t").desc()]).count() == 0
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    emptyd = spark.createDataFrame([], "k long, v string")
    assert {r.k: r.v for r in
            api.merge_upsert(base, emptyd, "k").collect()} == {1: "a"}


def test_duplicate_keys_both_sides_join_cardinality(spark):
    """m×n fan-out on duplicate keys: the join multiplicity contract
    (and the reason dedup-before-join matters at scale)."""
    l = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    r = spark.createDataFrame([(1,), (1,), (1,)], "k long")
    assert l.join(r, "k").count() == 2 * 3  # key 1: 2x3, key 2: 0


def test_spark_pdf_fallback_engages_on_out_of_ns_range(spark):
    """r12 ADVICE twin-pin: (a) the out-of-ns-range fallback must
    actually ENGAGE on a year-9999 frame (the trigger used to match
    one literal pyarrow message; a rewording would silently re-break
    collection), and (b) inside the fallback an all-NULL bigint column
    must coerce to float64/NaN via the per-column Arrow round-trip,
    not object/None from bare pd.Series inference — the dtype the
    NaN-vs-NULL canonicalization policy expects."""
    import numpy as np
    import pandas as pd

    from zio_kinesis_example_spark.tools import oracle as O

    df = spark.sql(
        "SELECT timestamp_ntz'9998-12-31 23:59:59' AS ts, "
        "CAST(NULL AS BIGINT) AS v, 'x' AS s "
        "UNION ALL SELECT timestamp_ntz'2024-01-01 00:00:00', "
        "CAST(NULL AS BIGINT), 'y'")
    # the premise: the normal Arrow path must fail on this frame (if a
    # future Spark/Arrow collects it fine, the fallback is moot and
    # this pin should be revisited)
    try:
        df.toPandas()
        raised = False
    except Exception as e:
        raised = True
        assert O._is_out_of_range_ts_error(e), (
            "fallback trigger did not recognize the real "
            f"out-of-ns-range error: {e}")
    assert raised, "expected year-9998 toPandas() to fail under Arrow ns"
    pdf = O._spark_pdf(df)
    assert len(pdf) == 2
    assert pdf["v"].dtype == np.float64          # NOT object
    assert pdf["v"].isna().all()
    assert pdf["ts"].dtype == object             # temporal stays object
    # canonicalization sees identical rows to a DuckDB frame would
    rows = O.canonical_rows(pdf)
    assert len(rows) == 2
