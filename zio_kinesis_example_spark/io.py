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
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

_FORMATS = ("parquet", "json", "csv", "orc", "xml")
#: XML element names for the built-in Spark 4 xml source — one
#: fixed vocabulary on both sides so write/read agree without
#: caller coordination (Avro stays unsupported: it is an external
#: data-source module, not shipped in the plain pyspark install).
_XML_ROW_TAG = "row"
_XML_ROOT_TAG = "rows"

#: Layout-version marker for escaped CSV directories (round 8): dirs
#: written with backslash escaping carry this file; read_table only
#: unescapes when it is present, so pre-escape directories (raw
#: backslashes) read back exactly as before instead of having their
#: backslash runs silently halved. Local-filesystem paths (this
#: engine's CSV scope); a lake deployment would use the Hadoop
#: FileSystem API for the same touch/exists pair.
_CSV_ESCAPE_MARKER = "_zke_csv_escaped_v1"


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
    if fmt == "csv":
        # ONE consolidated CSV block (r9 review: the escape projection,
        # writer options, and marker/guard logic were split across three
        # separate branches with a duplicated save site).
        import os

        marker = os.path.join(path, _CSV_ESCAPE_MARKER)
        path_existed = os.path.exists(path)
        had_data = os.path.isdir(path) and any(
            not f.startswith(("_", ".")) for f in os.listdir(path))
        legacy = had_data and not os.path.exists(marker)
        if legacy and mode == "append":
            # appending escaped rows into a pre-escape directory would
            # mix layouts, and stamping it would corrupt the legacy
            # rows' backslashes on read (r8 review)
            raise ValueError(
                "append into a legacy (pre-escape) CSV directory: "
                "rewrite it with mode='overwrite' first")
        if (legacy and mode == "overwrite" and partition_by
                and str(df.sparkSession.conf.get(
                    "spark.sql.sources.partitionOverwriteMode",
                    "static")).lower() == "dynamic"):
            # dynamic overwrite rewrites ONLY the partitions present in
            # df, leaving other legacy partitions' raw-backslash rows in
            # place — stamping afterwards would corrupt them on read
            # (r9 review: the r8 guard covered append only)
            raise ValueError(
                "dynamic partition-overwrite into a legacy (pre-escape) "
                "CSV directory would mix layouts: rewrite the whole "
                "directory with static overwrite first")
        # The NULL sentinel (\N) is taken OUT of band by backslash
        # escaping (round 8; closes the r7 in-band-sentinel limitation):
        # every literal backslash in a string cell doubles on write, so
        # a genuine "\N" value serializes as \\N — which the reader's
        # nullValue match ("\N", applied after unquoting) does NOT
        # consume — and read_table's unescape restores it. Literal
        # string replace (F.replace), not regex. NULL/''/backslash
        # payloads all round-trip losslessly (tests/test_io.py).
        # read_table unescapes ONLY marker-stamped dirs, so pre-escape
        # directories keep their exact old read behavior.
        for f in df.schema.fields:
            if isinstance(f.dataType, StringType):
                df = df.withColumn(
                    f.name,
                    F.replace(F.col(f.name), F.lit("\\"), F.lit("\\\\")))
        # nullValue keeps NULL distinguishable from '' on the round
        # trip; the whitespace options disable the WRITER's default
        # trimming (r8 review: ignore{Leading,Trailing}WhiteSpace
        # default TRUE on write — '  padded  ' came back 'padded').
        writer = (df.write.format(fmt).mode(mode)
                  .option("header", "true")
                  .option("nullValue", "\\N")
                  .option("ignoreLeadingWhiteSpace", "false")
                  .option("ignoreTrailingWhiteSpace", "false"))
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        # stamp ONLY when this call actually (re)wrote the layout.
        # Spark's ignore mode no-ops whenever the PATH exists — even an
        # empty pre-created dir (r9 review: counting only data files
        # stamped a dir the write skipped), so gate on path existence.
        if not (mode == "ignore" and path_existed):
            with open(marker, "w"):
                pass
        return
    writer = df.write.format(fmt).mode(mode)
    if fmt == "xml":
        writer = (writer.option("rootTag", _XML_ROOT_TAG)
                  .option("rowTag", _XML_ROW_TAG))
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
    if fmt == "xml":
        # ignoreSurroundingSpaces defaults TRUE and silently trims
        # padded string values on read (r10 review — the same lossy-
        # whitespace class the CSV writer options closed in r8)
        reader = (reader.option("rowTag", _XML_ROW_TAG)
                  .option("ignoreSurroundingSpaces", "false"))
    if fmt == "csv":
        # multiLine: values containing newlines were written quoted and
        # must not split records; nullValue mirrors write_table's
        # sentinel so '' reads back as '' and only \\N reads as NULL
        reader = (reader.option("header", "true")
                  .option("multiLine", "true")
                  .option("nullValue", "\\N"))
        df = reader.load(path)
        import os

        if not os.path.exists(os.path.join(path, _CSV_ESCAPE_MARKER)):
            return df  # legacy (pre-escape) layout: read exactly as before
        # undo write_table's backslash escaping (literal replace): the
        # nullValue match already happened, so every surviving \\ pair
        # is one escaped literal backslash
        for f in df.schema.fields:
            if isinstance(f.dataType, StringType):
                df = df.withColumn(
                    f.name,
                    F.replace(F.col(f.name), F.lit("\\\\"), F.lit("\\")))
        return df
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
