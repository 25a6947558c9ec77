"""Batch sources & sinks: parquet / JSON-lines / CSV, with declared
schemas and partitioned layouts.

The reference's only I/O is the Kinesis stream + DynamoDB lease table
(SURVEY.md §2.1 ops 1-3, 25); its serde layer (ASCII JSON,
TestMsgJsonSerde.scala:12-15) is the ancestor of the JSON reader here.
The batch formats are [north-star] surface: a training-data pipeline
lands parquet lakes partitioned by coarse keys and exchanges JSON/CSV at
the edges.

Scale posture:
- schemas are DECLARED on read (never ``inferSchema`` — inference is a
  full extra pass over 100 TB and a correctness hazard);
- ``partition_by`` writes hive-style directory partitions so downstream
  reads prune entire directories (verified in tests via the plan's
  PartitionFilters);
- writers accept a target file count via ``coalesce_to`` — small-file
  storms are the classic lake killer at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "json", "csv", "orc")


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                partition_by: list[str] | None = None,
                mode: str = "overwrite",
                coalesce_to: int | None = None) -> None:
    """Write a DataFrame as a (optionally partitioned) table directory."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    if coalesce_to is not None:
        if coalesce_to < 1:
            # a computed target that underflowed to 0 must fail loudly,
            # not silently skip coalescing into a small-file storm
            raise ValueError(f"coalesce_to must be >= 1, got {coalesce_to}")
        df = df.coalesce(coalesce_to)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        # nullValue sentinel keeps NULL distinguishable from '' on the
        # round trip (default writes both as empty); the matching reader
        # options are set in read_table.
        #
        # DOCUMENTED LIMITATION — the sentinel is in-band: a string cell
        # whose value is LITERALLY backslash-N serializes identically to
        # a NULL (Spark's CSV writer does not escape backslashes, and
        # quoteAll does not disambiguate either: the reader applies
        # nullValue after unquoting — verified empirically). Such values
        # read back as NULL. CSV is the lossy interchange edge of this
        # engine; payloads that may contain the sentinel belong in
        # parquet/ORC (lossless) or need caller-side escaping. Likewise,
        # CSV directories written before the sentinel existed store NULL
        # as '' and must be rewritten to round-trip under read_table's
        # current options.
        writer = (writer.option("header", "true")
                  .option("nullValue", "\\N"))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: StructType | None = None) -> DataFrame:
    """Read a table directory. parquet/ORC carry their own schema;
    JSON/CSV REQUIRE a declared schema (no inference pass, ever)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    reader = spark.read.format(fmt)
    if fmt in ("parquet", "orc"):
        if schema is not None:
            reader = reader.schema(schema)
    else:
        if schema is None:
            raise ValueError(f"{fmt} reads require a declared schema "
                             "(inference is disabled by design)")
        reader = reader.schema(schema)
    if fmt == "csv":
        # multiLine: values containing newlines were written quoted and
        # must not split records; nullValue mirrors write_table's
        # sentinel so '' reads back as '' and only \\N reads as NULL
        reader = (reader.option("header", "true")
                  .option("multiLine", "true")
                  .option("nullValue", "\\N"))
    return reader.load(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write a BUCKETED managed table: rows are hash-distributed into
    ``n_buckets`` files per partition by ``bucket_col`` at write time, and
    the layout is recorded in the catalog.

    This is the 100 TB co-location primitive: two tables bucketed on
    their join key with the same bucket count join WITHOUT any exchange —
    the shuffle was paid once at write time and amortized over every
    subsequent join/aggregation on that key (verified in
    tests/test_io.py: the joined plan has zero Exchange operators).
    ``sort_col`` additionally sorts within buckets so sort-merge joins
    skip their sort too.

    Bucketing requires ``saveAsTable`` (the bucket spec lives in the
    metastore, not the parquet footer) — path-based ``save`` would
    silently drop it.
    """
    writer = df.write.format("parquet").mode(mode) \
        .bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
