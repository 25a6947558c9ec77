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
from .exact import dec_sum_double


@pandas_udf(DoubleType())
def price_bucket(price: pd.Series) -> pd.Series:
    """floor(price/1000)*1000 — vectorized over each Arrow batch."""
    return (price // 1000) * 1000.0 + 0.0


@query(
    "q_udf_scalar",
    oracle="""
        -- bucket + 0.0: a -0.0 price buckets to -0.0, and the two
        -- engines render the shared 0-group with different signs
        -- (r13 sign-bit rule); the sum guard mirrors dec_sum_double
        SELECT floor(o_totalprice / 1000) * 1000 + 0.0 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(CASE WHEN abs(o_totalprice) < 9.0e11
                             THEN o_totalprice END AS DECIMAL(18, 4)))
                    AS DOUBLE) AS sum_price
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
            # exact-decimal sum (r8 review: the raw double SUM was the
            # one unguarded money sum left in this file; q_udaf rounds
            # for the same reason)
            dec_sum_double("o_totalprice").alias("sum_price"),
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


@query(
    "q_udtf",
    oracle="""
        WITH c AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents
                  WHERE doc_id % 50 = 0 AND text IS NOT NULL)
            GROUP BY doc_id, term
        )
        SELECT doc_id, term, n,
               CAST(rn AS INT) AS rnk
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY n DESC, term) AS rn
              FROM c)
        WHERE rn <= 3
    """,
    tags=("udf", "udtf"),
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): top-3 terms per document — the
    row→rows extensibility surface completing the UDF family (scalar
    pandas UDF, applyInPandas UDAF, and this). Registered and invoked
    through SQL LATERAL, the way a user extends the engine with a
    custom generator.

    DETERMINISM: exact integer counts, ties broken (count desc, term
    asc) inside the UDTF — the oracle replays the same ranking in SQL.

    Scale shape: a UDTF is per-row Python (the documented slow path —
    q_text_bigrams computes the same statistics with JVM explode+agg);
    it is used here on a FILTERED slice (doc_id % 50) and emits ≤3 rows
    per input row, so the Python boundary processes a bounded set. The
    lateral join parallelizes per-partition; no shuffle before it.
    """
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="term: string, n: bigint, rnk: int")
    class TopTerms:
        def eval(self, text: str, k: int):
            if text is None:       # a NULL doc costs its own row (r12)
                return
            counts = Counter(text.split(" "))
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for i, (term, n) in enumerate(ranked[:k]):
                yield term, n, i + 1

    spark.udtf.register("top_terms", TopTerms)
    load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    ).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.term, t.n, t.rnk "
        "FROM __udtf_docs, LATERAL top_terms(text, 3) t"
    )
