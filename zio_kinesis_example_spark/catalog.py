"""Typed loaders for the driver-generated testdata tables (TESTDATA.md,
FIXTURES.md §B).

Schemas are *declared*, not inferred, mirroring the reference's static
nominal schema stance (case class + compile-time codec,
reference TestMsgJsonSerde.scala:9, TestMsg.scala:3): we verify the parquet
footer schema matches what FIXTURES.md promises rather than silently
accepting drift.

Scale note: loaders return plain ``spark.read.parquet`` scans so Catalyst
keeps full pushdown/pruning freedom — no caching, no collect. At 100 TB the
same code path reads a partitioned lake; only ``sf_dir`` changes.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import RUNTIME_CONFS

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: SparkSession objects already configured — configure() used to re-issue
#: its conf.set py4j round trips on EVERY load() call (thousands per
#: sweep, r8 review); one pass per session is enough (queries never
#: change these confs mid-session). Keyed by SESSION IDENTITY, not
#: applicationId (r9 advice): cloned sessions (SparkSession.newSession /
#: a separate SQLConf) share one applicationId but carry their OWN conf,
#: and an appId key would silently skip the correctness-bearing runtime
#: confs (nanosAsLong, UTC timezone, broadcast threshold) on the clone.
#: A WeakSet so dead session wrappers never pin memory.
_CONFIGURED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _is_cannot_modify(exc: Exception) -> bool:
    """True iff ``exc`` is Spark's you-may-not-set-a-static-conf error.

    Matched by error CLASS first (``CANNOT_MODIFY_CONFIG`` — stable
    across Spark releases via the error-class framework; PySpark 4
    exposes it as ``getCondition()``, older as ``getErrorClass()``),
    with the message-substring check only as a fallback for exception
    types that carry no class accessor (r9 advice: a release that
    rewords the message must not turn the benign static-conf case into
    a hard raise at query time)."""
    for accessor in ("getCondition", "getErrorClass"):
        fn = getattr(exc, accessor, None)
        if callable(fn):
            try:
                cls = fn()
            except Exception:
                cls = None
            if cls is not None and "CANNOT_MODIFY_CONFIG" in str(cls):
                return True
    # FALL THROUGH on a non-matching class (r9 review): legacy Spark
    # spells this error with a _LEGACY_ERROR_TEMP_* class and only the
    # message identifies it — an early `return False` there would
    # hard-raise the exact benign case this function exists to tolerate.
    return ("CANNOT_MODIFY_CONFIG" in str(exc)
            or "Cannot modify" in str(exc))


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we may not have created
    (the driver passes its own SparkSession into ``queries()`` callables).
    Memoized per session object; only the cannot-modify-static-conf case
    is tolerated (r8 review: a blanket except swallowed genuinely
    invalid values, e.g. a bad timezone string, leaving the session
    silently misconfigured and every timestamp oracle mysteriously
    red)."""
    if spark in _CONFIGURED:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:
            if not _is_cannot_modify(exc):
                raise
    _CONFIGURED.add(spark)
    return spark


def path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with normalized column types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it as
    int64 ns (``nanosAsLong``) and we convert to timestamp_ntz at µs
    precision — the same truncation DuckDB applies, so oracle comparisons
    agree. All other tables load as-is (orders/lineitem dates are already
    timestamp_ntz).
    """
    configure(spark)
    df = spark.read.parquet(path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql-based queries,
    e.g. GROUPING SETS which has no DataFrame-API equivalent)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

#: DuckDB WITH-fragment mirroring ``operators.llm_similarity.emb_table``
#: (the r12 malformed-vector contract): prepend inside an oracle's WITH
#: list and read FROM emb_valid instead of embeddings. Lives here (not
#: in llm_similarity) only to stay importable from llm_dedup, which
#: llm_similarity itself imports at module level. Majority-dim
#: tie-break (count DESC, d ASC) matches _majority_dim.
EMB_VALID_SQL = """
        embdim AS (
            SELECT len(embedding) AS d FROM embeddings
            WHERE embedding IS NOT NULL
            GROUP BY 1 ORDER BY count(*) DESC, d LIMIT 1),
        emb_valid AS (
            SELECT vec_id, embedding, label FROM embeddings, embdim
            WHERE embedding IS NOT NULL AND len(embedding) = d
              AND len(list_filter(embedding, x ->
                    x IS NULL OR isnan(x) OR isinf(x))) = 0)"""
