"""UDF/UDAF demonstrations (SURVEY.md §2.2 last rows): the sanctioned slow
path, done the fast way.

- Scalar: a *pandas* UDF (Arrow-batched, vectorized numpy inside) — never
  a row-at-a-time Python UDF. The reference's per-record processRecord
  (CheckpointOnChunkEndStreamClient.scala:95-101) is the analogous
  user-supplied per-record computation.
- Grouped UDAF: ``applyInPandas`` — each group materializes as one pandas
  frame; group sizes must be bounded (here: ≤ |customers per segment|).

Both queries compute arithmetic an oracle can recompute in SQL, so even
the UDF path is hash-checked, not just rows-counted.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..catalog import load
from ..registry import query


@pandas_udf(DoubleType())
def price_bucket(price: pd.Series) -> pd.Series:
    """floor(price/1000)*1000 — vectorized over each Arrow batch."""
    return (price // 1000) * 1000.0


@query(
    "q_udf_scalar",
    oracle="""
        SELECT floor(o_totalprice / 1000) * 1000 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(o_totalprice) AS sum_price
        FROM orders
        GROUP BY 1
    """,
    tags=("udf",),
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom bucketing via pandas UDF, aggregated per bucket. The UDF's
    arithmetic is replayed exactly in the oracle, so the Arrow transfer
    path itself is value-checked."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("bucket", price_bucket(F.col("o_totalprice")))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("sum_price"),
        )
    )


def _segment_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group custom aggregate: count + balance-weighted stats."""
    bal = pdf["c_acctbal"]
    return pd.DataFrame({
        "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
        "n_customers": [int(len(pdf))],
        "sum_acctbal": [round(float(bal.sum()), 6)],
        "min_acctbal": [float(bal.min())],
        "max_acctbal": [float(bal.max())],
    })


@query(
    "q_udaf",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               round(SUM(c_acctbal), 6) AS sum_acctbal,
               MIN(c_acctbal) AS min_acctbal,
               MAX(c_acctbal) AS max_acctbal
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("udf",),
)
def q_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation via applyInPandas (the UDAF surface).

    Output schema declared explicitly; sums rounded 6dp on both sides to
    absorb summation-order float drift between pandas and the oracle.
    """
    c = load(spark, sf_dir, "customer")
    schema = ("c_mktsegment string, n_customers long, sum_acctbal double, "
              "min_acctbal double, max_acctbal double")
    return c.groupBy("c_mktsegment").applyInPandas(_segment_stats, schema=schema)
