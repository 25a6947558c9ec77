"""SparkSession factory.

Local mode is only the test harness; every config here is chosen to also be
the right default on a 1000-executor cluster reading ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy
  switch) so plans self-correct at scale.
- ``spark.sql.shuffle.partitions`` small locally; on a real cluster this is
  superseded by AQE's coalescing + initial partition num.
- Arrow enabled so every Python-side exchange (pandas UDFs, toPandas) is
  columnar-batched, never row-at-a-time pickling.
- UTC session timezone: deterministic date/timestamp semantics regardless of
  host timezone (the reference pins behavior via explicit serde the same way,
  TestMsgJsonSerde.scala:12-15).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to *any* session (including a driver-provided
# one) before reading testdata. Kept separate from builder-time confs so that
# `catalog.configure(spark)` can apply them to sessions we did not create.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet stores TIMESTAMP(NANOS); Spark's parquet reader rejects
    # it unless read as raw int64 ns (converted in catalog.load()).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # plan-affecting confs that must match between the bench session and
    # a driver-provided one (r8 review: without these the driver ran
    # 10MB-threshold shuffle joins and row-pickled toPandas where the
    # bench broadcast and Arrow-batched — different plans, same values)
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def get_spark(app_name: str = "zio-kinesis-example-spark",
              cpus: str | int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Create (or get) a SparkSession for tests/bench.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
