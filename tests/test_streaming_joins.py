"""Stream-stream interval joins (watermark-bounded state) and
stream-static broadcast enrichment — the join half of the streaming
surface. Driven with trigger(availableNow) for determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from zio_kinesis_example_spark.catalog import load
from zio_kinesis_example_spark.streaming import (
    ShardDirProducer, decode_json, shard_source,
)
from zio_kinesis_example_spark.streaming.windows import (
    TESTMSG_TS_SCHEMA,
    run_available_now,
    stream_static_enrich,
    stream_stream_interval_join,
    with_event_time,
)

from .conftest import SF_SMALL


def _dirs(tmpdir_factory_local, name: str):
    return (tmpdir_factory_local(f"{name}-src"),
            tmpdir_factory_local(f"{name}-ckpt"))


def test_stream_stream_interval_join(spark, tmpdir_factory_local):
    """Purchases pair with same-user clicks within the preceding 10
    minutes — a many-to-many event-time interval join with state bounded
    by watermarks on both sides."""
    src, ckpt = _dirs(tmpdir_factory_local, "ssjoin")
    # odd ids = clicks, even ids = purchases; all one user (single shard)
    t = {
        1: "2024-01-01 00:00:00",  # click
        2: "2024-01-01 00:05:00",  # purchase -> click 1 (5m)
        4: "2024-01-01 00:20:00",  # purchase -> click 5 (2m); click 1 too old
        5: "2024-01-01 00:18:00",  # click
        6: "2024-01-01 00:25:00",  # purchase -> click 5 (7m)
        7: "2024-01-01 01:00:00",  # click, watermark pusher; no purchase after
    }
    prod = ShardDirProducer(
        src, n_shards=1, payload_fn=lambda i: {"id": i, "event_ts": t[i]})
    prod.produce(1, 2)
    prod.produce(4, 4)

    valid, _ = decode_json(shard_source(spark, src), TESTMSG_TS_SCHEMA)
    ev = with_event_time(valid)
    clicks = ev.filter(F.col("id") % 2 == 1).select(
        F.col("shard_id").alias("user"),
        F.col("id").alias("click_id"),
        F.col("event_ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("id") % 2 == 0).select(
        F.col("shard_id").alias("p_user"),
        F.col("id").alias("purchase_id"),
        F.col("event_ts").alias("purchase_ts"),
    )
    joined = stream_stream_interval_join(clicks, purchases)
    emitted: list = []
    run_available_now(joined, ckpt, emitted)
    pairs = sorted((r.click_id, r.purchase_id) for r in emitted)
    assert pairs == [(1, 2), (5, 4), (5, 6)]


def test_stream_static_enrichment(spark, tmpdir_factory_local):
    """Every micro-batch broadcast-joins the static customer dim; the
    stream side never shuffles and unmatched ids survive (left join)."""
    src, ckpt = _dirs(tmpdir_factory_local, "senrich")
    prod = ShardDirProducer(src, n_shards=2, batch_size=20)
    prod.produce_all(60)

    valid, _ = decode_json(shard_source(spark, src))
    dim = load(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = stream_static_enrich(valid, dim, "id", "c_custkey")
    emitted: list = []
    run_available_now(enriched, ckpt, emitted)
    assert len(emitted) == 60
    seg = {r.id: r.c_mktsegment for r in emitted}
    # ids 1..60 exist in customer (150 rows at sf0.001) -> all enriched
    assert all(seg[i] is not None for i in range(1, 61))


def test_stream_stream_interval_join_left_outer(spark, tmpdir_factory_local):
    """Left-outer interval join: a click with no purchase in its 10-minute
    window is emitted with NULL purchase columns once the watermark proves
    no match can arrive. Files are fed one per micro-batch so the
    watermark advances across batches (batch N joins with the watermark
    computed from batch N-1's max event time — the null row for click 3
    can only flush in batch 3)."""
    src, ckpt = _dirs(tmpdir_factory_local, "ssjoin-outer")
    t = {
        1: "2024-01-01 00:00:00",  # click -> purchase 2 (5m)
        2: "2024-01-01 00:05:00",  # purchase
        3: "2024-01-01 00:30:00",  # click, never matched
        # pusher pair: the GLOBAL watermark is min(click wm, purchase wm),
        # so BOTH sides need a late event for eviction to progress
        8: "2024-01-01 02:00:00",  # purchase pusher: purchase wm -> 01:58
        9: "2024-01-01 02:00:00",  # click pusher: click wm -> 01:58
        10: "2024-01-01 03:00:00",  # batch 3: evaluates with global wm 01:58
    }
    prod = ShardDirProducer(
        src, n_shards=1, payload_fn=lambda i: {"id": i, "event_ts": t[i]})
    prod.produce(1, 3)   # batch 1: ids 1,2,3
    prod.produce(8, 2)   # batch 2: ids 8,9
    prod.produce(10, 1)  # batch 3: id 10

    valid, _ = decode_json(
        shard_source(spark, src, max_files_per_trigger=1), TESTMSG_TS_SCHEMA)
    ev = with_event_time(valid)
    clicks = ev.filter(F.col("id").isin(1, 3, 9)).select(
        F.col("shard_id").alias("user"),
        F.col("id").alias("click_id"),
        F.col("event_ts").alias("click_ts"),
    )
    purchases = ev.filter(~F.col("id").isin(1, 3, 9)).select(
        F.col("shard_id").alias("p_user"),
        F.col("id").alias("purchase_id"),
        F.col("event_ts").alias("purchase_ts"),
    )
    joined = stream_stream_interval_join(clicks, purchases, how="left_outer")
    emitted: list = []
    run_available_now(joined, ckpt, emitted)
    # click 9 matches purchase 8 at the same instant (inclusive bound) —
    # emitted as a pair, not held for the outer flush.
    pairs = sorted(
        (r.click_id, r.purchase_id) for r in emitted
    )
    assert pairs == [(1, 2), (3, None), (9, 8)]
    null_row = next(r for r in emitted if r.purchase_id is None)
    assert null_row.purchase_ts is None and null_row.click_id == 3


def test_stream_static_enrichment_same_key_name(spark, tmpdir_factory_local):
    """The common enrichment invocation: stream and dimension share the
    key COLUMN NAME. The r8 aliased join must resolve it (the unaliased
    form failed analysis with AMBIGUOUS_REFERENCE)."""
    src, ckpt = _dirs(tmpdir_factory_local, "senrich-same")
    prod = ShardDirProducer(src, n_shards=2, batch_size=20)
    prod.produce_all(40)

    valid, _ = decode_json(shard_source(spark, src))
    dim = load(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("id"), "c_mktsegment"
    )
    enriched = stream_static_enrich(valid, dim, "id", "id") \
        .select(F.col("s.id").alias("id"), "c_mktsegment")
    emitted: list = []
    run_available_now(enriched, ckpt, emitted)
    assert len(emitted) == 40
    assert all(r.c_mktsegment is not None for r in emitted)
