"""Batch source/sink coverage: schema-declared round-trips for every
supported format, hive-partitioned writes with verified partition
pruning, and the streaming->parquet sink path."""

from __future__ import annotations

import contextlib
import io as _io

from pyspark.sql import functions as F

from zio_kinesis_example_spark.catalog import load
from zio_kinesis_example_spark.io import read_table, write_table

from .conftest import SF_SMALL


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_json_csv_roundtrip_preserves_rows(spark, tmpdir_factory_local):
    src = load(spark, SF_SMALL, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    df = src.select(*cols)
    want = _sorted_rows(df, cols)
    for fmt in ("json", "csv"):
        out = tmpdir_factory_local(f"roundtrip-{fmt}")
        write_table(df, out, fmt=fmt)
        back = read_table(spark, out, fmt=fmt, schema=df.schema)
        assert _sorted_rows(back, cols) == want, fmt


def test_csv_read_requires_declared_schema(spark, tmpdir_factory_local):
    out = tmpdir_factory_local("csv-noschema")
    write_table(load(spark, SF_SMALL, "region"), out, fmt="csv")
    try:
        read_table(spark, out, fmt="csv")
    except ValueError as e:
        assert "declared schema" in str(e)
    else:
        raise AssertionError("schema-less csv read must be rejected")


def test_partitioned_write_prunes_on_read(spark, tmpdir_factory_local):
    """A filter on the partition column must prune directories at plan
    time (PartitionFilters), not scan-and-discard."""
    out = tmpdir_factory_local("part-docs")
    write_table(load(spark, SF_SMALL, "documents"), out,
                partition_by=["lang"], coalesce_to=2)
    back = read_table(spark, out).filter(F.col("lang") == "en")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lang" in pf
    # pruned read returns exactly the en docs
    n_en = load(spark, SF_SMALL, "documents").filter("lang = 'en'").count()
    assert back.count() == n_en


def test_streaming_parquet_sink(spark, tmpdir_factory_local):
    """Stream -> parquet sink with checkpoint: the durable-landing-zone
    path (micro-batch commit protocol makes the directory exactly-once
    per epoch)."""
    from zio_kinesis_example_spark.streaming import (
        ShardDirProducer, decode_json, shard_source,
    )
    src = tmpdir_factory_local("sink-src")
    ckpt = tmpdir_factory_local("sink-ckpt")
    out = tmpdir_factory_local("sink-out")
    ShardDirProducer(src, n_shards=2, batch_size=25).produce_all(100)
    valid, _ = decode_json(shard_source(spark, src))
    q = (
        valid.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(out)
    assert landed.count() == 100
    assert landed.select("id").distinct().count() == 100


def test_orc_roundtrip_preserves_rows(spark, tmpdir_factory_local):
    """ORC is a self-describing columnar format like parquet: roundtrip
    preserves rows and needs no declared schema on read."""
    from zio_kinesis_example_spark.catalog import load
    from zio_kinesis_example_spark.io import read_table, write_table

    df = load(spark, SF_SMALL, "nation")
    out = tmpdir_factory_local("roundtrip-orc")
    write_table(df, out, fmt="orc")
    back = read_table(spark, out, fmt="orc")
    cols = df.columns
    assert (sorted(map(tuple, back.select(cols).collect()))
            == sorted(map(tuple, df.select(cols).collect())))


def test_bucketed_tables_join_without_exchange(spark):
    """Co-located join: two tables bucketed on the join key with equal
    bucket counts must sort-merge join with ZERO Exchange operators — the
    shuffle was paid once at write time (the 100 TB amortization story).
    Broadcast is disabled for the assertion so the plan can't sidestep
    the claim with a BroadcastHashJoin."""
    import contextlib
    import io as _io

    from zio_kinesis_example_spark.catalog import load
    from zio_kinesis_example_spark.io import write_bucketed

    o = load(spark, SF_SMALL, "orders")
    li = load(spark, SF_SMALL, "lineitem")
    write_bucketed(o, "t_orders_b", "o_orderkey", n_buckets=4,
                   sort_col="o_orderkey")
    write_bucketed(li, "t_lineitem_b", "l_orderkey", n_buckets=4,
                   sort_col="l_orderkey")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("t_orders_b")
            .join(
                spark.table("t_lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("simple")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # the join itself is exchange-free; only the 5-group final agg
        # may exchange
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part
        n = joined.count()
        assert n == 5  # one row per priority
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_csv_roundtrip_newlines_empty_and_null(spark, tmpdir_factory_local):
    """The r6 review fix: embedded newlines survive (multiLine read),
    and '' and NULL stay DISTINCT through the nullValue sentinel —
    the default CSV options split multi-line records and collapse
    empty strings into NULLs."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from zio_kinesis_example_spark.io import read_table, write_table

    schema = StructType([
        StructField("id", LongType()),
        StructField("s", StringType()),
    ])
    rows = [(1, "line one\nline two"), (2, ""), (3, None), (4, "plain")]
    df = spark.createDataFrame(rows, schema)
    d = str(tmpdir_factory_local("csv-roundtrip"))
    write_table(df, d, fmt="csv")
    got = {r.id: r.s for r in read_table(spark, d, fmt="csv",
                                         schema=schema).collect()}
    assert got == {1: "line one\nline two", 2: "", 3: None, 4: "plain"}


def test_csv_sentinel_escape_roundtrip(spark, tmpdir_factory_local):
    """The r8 escape fix (io.py write_table/read_table): the \\N NULL
    sentinel is taken out of band by doubling literal backslashes on
    write and halving on read, so a string cell that is literally
    backslash-N — or any backslash-bearing payload, including ones that
    look like escaped sentinels — round-trips EXACTLY and stays
    distinct from NULL (the r7 behavior read all of these back as NULL
    or mangled them)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from zio_kinesis_example_spark.io import read_table, write_table

    schema = StructType([
        StructField("id", LongType()),
        StructField("s", StringType()),
    ])
    rows = [
        (1, "\\N"),          # the sentinel itself, as a real value
        (2, None),           # a genuine NULL
        (3, "\\\\N"),        # pre-escaped-looking payload
        (4, "\\"),           # lone backslash
        (5, "a\\b\\\\c"),    # interior single + double backslashes
        (6, ""),             # empty string stays distinct from NULL
        (7, "\\N extra"),    # sentinel as a prefix only
        (8, "  padded  "),   # writer whitespace trimming disabled (r8)
    ]
    df = spark.createDataFrame(rows, schema)
    d = str(tmpdir_factory_local("csv-sentinel"))
    write_table(df, d, fmt="csv")
    got = {r.id: r.s for r in read_table(spark, d, fmt="csv",
                                         schema=schema).collect()}
    assert got == dict(rows)


def test_write_table_rejects_zero_coalesce(spark, tmpdir_factory_local):
    import pytest as _pytest

    from zio_kinesis_example_spark.io import write_table

    df = spark.range(3)
    with _pytest.raises(ValueError, match="coalesce_to"):
        write_table(df, str(tmpdir_factory_local("bad-coalesce")),
                    coalesce_to=0)


def test_csv_legacy_dir_without_marker_reads_unescaped(
        spark, tmpdir_factory_local):
    """Directories written before the r8 escape (no _zke_csv_escaped_v1
    marker) keep their exact old read behavior: backslash runs are NOT
    halved, and the in-band \\N sentinel limitation still applies
    there (a literal \\N reads as NULL) — rewriting the dir is what
    upgrades it to the lossless contract."""
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from zio_kinesis_example_spark.io import (
        _CSV_ESCAPE_MARKER, read_table, write_table,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("s", StringType()),
    ])
    # raw pre-r8 bytes: simulate by writing with plain Spark options
    # (no escaping), as the old writer did
    d = str(tmpdir_factory_local("csv-legacy"))
    df = spark.createDataFrame([(1, "a\\b"), (2, "\\N"), (3, "x")], schema)
    (df.write.format("csv").mode("overwrite")
       .option("header", "true").option("nullValue", "\\N").save(d))
    assert not os.path.exists(os.path.join(d, _CSV_ESCAPE_MARKER))
    got = {r.id: r.s for r in read_table(spark, d, fmt="csv",
                                         schema=schema).collect()}
    assert got == {1: "a\\b", 2: None, 3: "x"}
    # and the r8 writer stamps the marker
    d2 = str(tmpdir_factory_local("csv-stamped"))
    write_table(df, d2, fmt="csv")
    assert os.path.exists(os.path.join(d2, _CSV_ESCAPE_MARKER))


def test_csv_append_into_legacy_dir_is_refused(spark, tmpdir_factory_local):
    """Appending escaped rows into a pre-escape directory would mix
    layouts (and stamping it would halve the legacy rows' backslashes on
    read) — write_table must refuse; mode='ignore' on a legacy dir must
    not stamp the marker either."""
    import os

    import pytest

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from zio_kinesis_example_spark.io import (
        _CSV_ESCAPE_MARKER, read_table, write_table,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("s", StringType()),
    ])
    d = str(tmpdir_factory_local("csv-legacy-append"))
    df = spark.createDataFrame([(1, "a\\b")], schema)
    (df.write.format("csv").mode("overwrite")
       .option("header", "true").option("nullValue", "\\N").save(d))
    with pytest.raises(ValueError, match="legacy"):
        write_table(df, d, fmt="csv", mode="append")
    write_table(df, d, fmt="csv", mode="ignore")  # no-op, no stamp
    assert not os.path.exists(os.path.join(d, _CSV_ESCAPE_MARKER))
    got = {r.id: r.s for r in read_table(spark, d, fmt="csv",
                                         schema=schema).collect()}
    assert got == {1: "a\\b"}  # legacy bytes still read unhalved


def test_xml_roundtrip_preserves_rows(spark, tmpdir_factory_local):
    """XML joins the format battery (Spark 4 built-in xml source):
    declared-schema roundtrip with the fixed row/root tag vocabulary —
    the document-interchange edge format next to JSON/CSV. Schema
    inference stays disabled by design, like every non-self-describing
    format here."""
    src = load(spark, SF_SMALL, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    df = src.select(*cols)
    out = tmpdir_factory_local("roundtrip-xml")
    write_table(df, out, fmt="xml")
    back = read_table(spark, out, fmt="xml", schema=df.schema)
    assert _sorted_rows(back, cols) == _sorted_rows(df, cols)
    # schema-less xml read rejected, the csv/json rule
    try:
        read_table(spark, out, fmt="xml")
    except ValueError as e:
        assert "declared schema" in str(e)
    else:
        raise AssertionError("schema-less xml read must be rejected")
    # padded strings survive (r10 review: ignoreSurroundingSpaces
    # defaults TRUE on read and silently trimmed '  padded  ' —
    # the same lossy-whitespace class the CSV options closed in r8)
    pdf = spark.createDataFrame(
        [(1, "  padded  "), (2, "x")], "id long, s string")
    out2 = tmpdir_factory_local("roundtrip-xml-pad")
    write_table(pdf, out2, fmt="xml")
    back2 = read_table(spark, out2, fmt="xml", schema=pdf.schema)
    assert {(r.id, r.s) for r in back2.collect()} == \
        {(1, "  padded  "), (2, "x")}
