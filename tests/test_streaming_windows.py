"""Event-time windows, watermark late-data eviction, session windows,
custom stateful counting, and source rate limiting (SURVEY.md §2.2
streaming table [north-star] rows).

Determinism: each test drives the stream with trigger(availableNow) runs
against one checkpoint dir — every run is a hard batch boundary, and the
watermark persists in the commit log between runs, so late-data behavior
is exactly reproducible (no sleeps, no races).
"""

from __future__ import annotations

import pytest

from zio_kinesis_example_spark.streaming import (
    ShardDirProducer, decode_json, shard_source,
)
from zio_kinesis_example_spark.streaming.windows import (
    TESTMSG_TS_SCHEMA,
    run_available_now,
    running_count_stateful,
    session_counts,
    tumbling_counts,
    with_event_time,
)


def _ts_payload(times: dict[int, str]):
    return lambda i: {"id": i, "event_ts": times[i]}


def _dirs(tmpdir_factory_local, name: str):
    return (tmpdir_factory_local(f"{name}-src"),
            tmpdir_factory_local(f"{name}-ckpt"))


def _windowed(spark, src):
    valid, _ = decode_json(shard_source(spark, src), TESTMSG_TS_SCHEMA)
    return with_event_time(valid)


def test_tumbling_window_watermark_drops_late(spark, tmpdir_factory_local):
    """Append-mode tumbling windows: each window emitted exactly once when
    the watermark passes it; a record later than the watermark is dropped
    (never re-opens a finalized window)."""
    src, ckpt = _dirs(tmpdir_factory_local, "tumbling")
    t = {
        1: "2024-01-01 00:00:10", 2: "2024-01-01 00:00:40",  # window 00:00
        3: "2024-01-01 00:01:20",                            # window 00:01
        4: "2024-01-01 00:05:00",  # advances watermark to 00:03
        5: "2024-01-01 00:00:30",  # LATE (< watermark 00:03) -> dropped
        6: "2024-01-01 00:03:30",  # on-time (>= watermark)
        7: "2024-01-01 00:10:00",  # advances watermark to 00:08
    }
    prod = ShardDirProducer(src, n_shards=2, payload_fn=_ts_payload(t))
    prod.produce(1, 4)  # ids 1-4

    agg = tumbling_counts(_windowed(spark, src))
    emitted: list = []
    run_available_now(agg, ckpt, emitted)
    # after run 1: watermark 00:03 -> windows ending <= 00:03 are final
    got = {(r.window_start.strftime("%H:%M"), r.n) for r in emitted}
    assert ("00:00", 2) in got and ("00:01", 1) in got
    assert not any(r.window_start.strftime("%H:%M") == "00:05" for r in emitted)

    prod.produce(5, 3)  # ids 5-7: one late, one on-time, one watermark-push
    emitted2: list = []
    run_available_now(tumbling_counts(_windowed(spark, src)), ckpt, emitted2)
    by_win = {r.window_start.strftime("%H:%M"): r.n for r in emitted2}
    # late id=5 dropped: closed window 00:00 NOT re-emitted
    assert "00:00" not in by_win
    # on-time id=6 lands in its own window; id=4's window finalizes too
    assert by_win.get("00:03") == 1
    assert by_win.get("00:05") == 1


def test_malformed_event_time_is_dead_lettered(spark, tmpdir_factory_local):
    """r12: a record whose event-time string is garbage or missing must
    cost ITSELF, never the query — under ANSI, to_timestamp RAISED on
    'not-a-timestamp' and TERMINATED the whole streaming query
    (measured before the try_to_timestamp fix). The malformed rows are
    dropped (the batch null-ts tick contract) and the window aggregates
    equal the clean-subset expectation."""
    src, ckpt = _dirs(tmpdir_factory_local, "badts")
    t = {
        1: "2024-01-01 00:00:10",   # window 00:00
        2: "not-a-timestamp",       # malformed -> dead-lettered
        3: None,                    # missing   -> dead-lettered
        4: "2024-01-01 00:00:40",   # window 00:00
        5: "2024-01-01 00:05:00",   # watermark pusher
    }
    prod = ShardDirProducer(src, n_shards=1, payload_fn=_ts_payload(t))
    prod.produce_all(5)
    emitted: list = []
    run_available_now(tumbling_counts(_windowed(spark, src)), ckpt, emitted)
    by_win = {r.window_start.strftime("%H:%M"): (r.n, r.sum_id)
              for r in emitted}
    # ids 2 and 3 are gone; ids 1+4 count (and sum) in their window
    assert by_win.get("00:00") == (2, 5)
    assert all(n == (2, 5) or ws != "00:00"
               for ws, n in by_win.items())


def test_session_window_gap_semantics(spark, tmpdir_factory_local):
    """Session windows close after 1 minute of inactivity; events within
    the gap merge into one session, a later event opens a new one."""
    src, ckpt = _dirs(tmpdir_factory_local, "session")
    t = {
        1: "2024-01-01 00:00:00", 2: "2024-01-01 00:00:30",  # session A
        3: "2024-01-01 00:03:00",                            # session B
        4: "2024-01-01 00:20:00",  # watermark pusher (own key/session)
    }
    # single shard so one partition_key stream per id is fine
    prod = ShardDirProducer(src, n_shards=1, payload_fn=_ts_payload(t))
    prod.produce(1, 4)

    valid, _ = decode_json(shard_source(spark, src), TESTMSG_TS_SCHEMA)
    events = with_event_time(valid).withColumn("skey", valid.shard_id)
    agg = session_counts(events, gap="1 minute", key="skey")
    emitted: list = []
    run_available_now(agg, ckpt, emitted)
    # watermark = 00:20 - 2min = 00:18 -> sessions A and B are closed
    spans = sorted(
        (r.session_start.strftime("%H:%M:%S"),
         r.session_end.strftime("%H:%M:%S"), r.n)
        for r in emitted
    )
    assert ("00:00:00", "00:01:30", 2) in spans  # merged ids 1,2 (+1min gap)
    assert ("00:03:00", "00:04:00", 1) in spans  # id 3 alone


def test_stateful_running_count_per_shard(spark, tmpdir_factory_local):
    """applyInPandasWithState per-shard running counter (the reference's
    Ref counter as managed state): counts accumulate across micro-batches
    and across query restarts (state restored from checkpoint)."""
    src, ckpt = _dirs(tmpdir_factory_local, "stateful")
    prod = ShardDirProducer(src, n_shards=4, batch_size=50)
    prod.produce_all(200)

    counted = running_count_stateful(shard_source(spark, src))
    emitted: list = []
    run_available_now(counted, ckpt, emitted, output_mode="update")
    latest = {r.shard_id: r.running_count for r in emitted}
    assert sum(latest.values()) == 200
    assert latest == {f"shard-{s:03d}": c for s, c in
                      enumerate(prod._seqs) if c}

    # restart with more data: state restores, counts keep growing
    prod.produce_all(300, start=201)  # 100 more records (201..300)
    emitted2: list = []
    run_available_now(running_count_stateful(shard_source(spark, src)),
                      ckpt, emitted2, output_mode="update")
    latest2 = {r.shard_id: r.running_count for r in emitted2}
    for shard, c2 in latest2.items():
        assert c2 >= latest.get(shard, 0)
    assert sum(latest2.values()) == 300


def test_max_files_per_trigger_paces_batches(spark, tmpdir_factory_local):
    """Source rate limiting (reference op 23 throttle analogue,
    TestUtils.scala:86-88): maxFilesPerTrigger=1 forces one producer file
    per micro-batch instead of draining everything in one epoch."""
    src, ckpt = _dirs(tmpdir_factory_local, "paced")
    prod = ShardDirProducer(src, n_shards=2, batch_size=10)
    prod.produce_all(50)  # 5 files

    epochs: list[int] = []

    def fb(batch_df, epoch_id):
        epochs.append(batch_df.count())

    q = (
        shard_source(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(epochs) == 50
    assert len([e for e in epochs if e]) == 5  # one file per batch


def test_dedup_within_watermark(spark, tmpdir_factory_local):
    """Duplicate ids re-delivered across micro-batches are emitted exactly
    once; state for old keys is evicted past the watermark."""
    from zio_kinesis_example_spark.streaming.windows import (
        dedup_within_watermark,
    )
    src, ckpt = _dirs(tmpdir_factory_local, "sdedup")
    t = {
        1: "2024-01-01 00:00:00",
        2: "2024-01-01 00:00:30",
        3: "2024-01-01 00:01:00",
        4: "2024-01-01 00:02:00",
    }
    # payload id repeats via id%2 key: ids 1..4 -> dup_key 1,0,1,0
    prod = ShardDirProducer(
        src, n_shards=1,
        payload_fn=lambda i: {"id": (i % 2) + 10, "event_ts": t[i]})
    prod.produce(1, 2)   # batch 1: keys 11, 10

    deduped = dedup_within_watermark(_windowed(spark, src), ["id"])
    emitted: list = []
    run_available_now(deduped, ckpt, emitted)
    assert sorted(r.id for r in emitted) == [10, 11]

    prod.produce(3, 2)   # batch 2: keys 11, 10 again -> both dropped
    emitted2: list = []
    run_available_now(dedup_within_watermark(_windowed(spark, src), ["id"]),
                      ckpt, emitted2)
    assert emitted2 == []


def test_complete_mode_running_totals(spark, tmpdir_factory_local):
    """Complete output mode: every micro-batch re-emits the FULL result
    table (running totals across all data seen), completing the
    append/update/complete output-mode coverage."""
    from pyspark.sql import functions as F
    src, ckpt = _dirs(tmpdir_factory_local, "complete")
    prod = ShardDirProducer(src, n_shards=2, batch_size=30)
    prod.produce_all(60)

    valid, _ = decode_json(shard_source(spark, src))
    counts = valid.groupBy(
        (F.col("id") % 3).alias("bucket")).agg(F.count(F.lit(1)).alias("n"))

    batches: list[list] = []

    def fb(batch_df, epoch_id):
        batches.append(batch_df.collect())

    q = (counts.writeStream.foreachBatch(fb).outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # the LAST emission is the complete running total over all 60 records
    final = {r.bucket: r.n for r in batches[-1]}
    assert final == {0: 20, 1: 20, 2: 20}
    assert sum(final.values()) == 60


def test_pattern_matches_stateful_across_batches(spark, tmpdir_factory_local):
    """Streaming CEP: the view/no-error/purchase pattern fires for
    purchases in LATER micro-batches than their view — the anchors live
    in the state store, not the batch."""
    from pyspark.sql import functions as F

    from zio_kinesis_example_spark.streaming import (
        ShardDirProducer, decode_json, shard_source,
    )
    from zio_kinesis_example_spark.streaming.windows import (
        TESTMSG_CEP_SCHEMA, pattern_matches_stateful, run_available_now,
        with_event_time,
    )

    src = tmpdir_factory_local("cep-src")
    ckpt = tmpdir_factory_local("cep-ckpt")
    t = {
        1: ("2024-01-01 00:00:00", "view"),
        2: ("2024-01-01 00:05:00", "error"),
        3: ("2024-01-01 00:10:00", "view"),     # error 00:05 < view 00:10
        4: ("2024-01-01 00:15:00", "purchase"),  # match (view 00:10)
        5: ("2024-01-01 00:20:00", "purchase"),  # batch 2: match via state
        6: ("2024-01-01 01:30:00", "purchase"),  # batch 2: > 30 min, no match
    }
    prod = ShardDirProducer(
        src, n_shards=1,
        payload_fn=lambda i: {"id": i, "event_ts": t[i][0],
                              "event_type": t[i][1]})

    def drain() -> list:
        valid, _ = decode_json(shard_source(spark, src), TESTMSG_CEP_SCHEMA)
        ev = with_event_time(valid).select(
            F.col("shard_id").alias("user"), "id", "event_type", "event_ts")
        out: list = []
        run_available_now(pattern_matches_stateful(ev), ckpt, out,
                          output_mode="append")
        return out

    # two availableNow runs against ONE checkpoint (module docstring's
    # deterministic batch-boundary pattern): the anchors must survive in
    # the state store between runs, i.e. across a restart.
    prod.produce(1, 4)
    emitted = drain()
    prod.produce(5, 2)
    emitted += drain()
    got = sorted(r.purchase_id for r in emitted)
    assert got == [4, 5]
    m4 = next(r for r in emitted if r.purchase_id == 4)
    assert m4.view_ts.minute == 10


def test_pattern_stateful_rejects_late_pre_view_purchase(spark,
                                                         tmpdir_factory_local):
    """A LATE purchase whose event time PRECEDES the stored view must
    not match: cross-batch out-of-order delivery used to satisfy
    ts - view <= window with a negative difference and emit a
    'view then purchase' instance that never happened in event time
    (code-review r5 finding). An in-window purchase after the same view
    still matches."""
    from pyspark.sql import functions as F

    from zio_kinesis_example_spark.streaming import (
        ShardDirProducer, decode_json, shard_source,
    )
    from zio_kinesis_example_spark.streaming.windows import (
        TESTMSG_CEP_SCHEMA, pattern_matches_stateful, run_available_now,
        with_event_time,
    )

    src = tmpdir_factory_local("cep-late-src")
    ckpt = tmpdir_factory_local("cep-late-ckpt")
    t = {
        1: ("2024-01-01 01:00:00", "view"),      # batch 1: anchor
        2: ("2024-01-01 00:50:00", "purchase"),  # batch 2: LATE, pre-view
        3: ("2024-01-01 01:10:00", "purchase"),  # batch 2: real match
    }
    prod = ShardDirProducer(
        src, n_shards=1,
        payload_fn=lambda i: {"id": i, "event_ts": t[i][0],
                              "event_type": t[i][1]})

    def drain() -> list:
        valid, _ = decode_json(shard_source(spark, src), TESTMSG_CEP_SCHEMA)
        ev = with_event_time(valid).select(
            F.col("shard_id").alias("user"), "id", "event_type", "event_ts")
        out: list = []
        run_available_now(pattern_matches_stateful(ev), ckpt, out,
                          output_mode="append")
        return out

    prod.produce(1, 1)
    emitted = drain()
    prod.produce(2, 2)
    emitted += drain()
    assert sorted(r.purchase_id for r in emitted) == [3]


def test_stateful_running_count_null_seq_transport(spark,
                                                   tmpdir_factory_local):
    """The kinesis/kafka envelope contract: seq is NULL (position rides
    seq_str). The stateful counter must count rows and keep max_seq at
    its prior value instead of aborting on int(NaN) (r8 review fix)."""
    from pyspark.sql import functions as F

    src, ckpt = _dirs(tmpdir_factory_local, "stateful-nullseq")
    prod = ShardDirProducer(src, n_shards=2, batch_size=25)
    prod.produce_all(50)

    env = shard_source(spark, src).withColumn(
        "seq", F.lit(None).cast("long"))
    emitted: list = []
    run_available_now(running_count_stateful(env), ckpt, emitted,
                      output_mode="update")
    latest = {r.shard_id: (r.running_count, r.max_seq) for r in emitted}
    assert sum(c for c, _ in latest.values()) == 50
    assert all(m == 0 for _, m in latest.values())
