"""Event-time windowed aggregation + custom stateful operators over the
sharded stream.

This is the [north-star] half of the streaming surface (SURVEY.md §2.2
streaming table, last row): the reference has no event time at all
(SURVEY.md §2.1 — "no timestamp extraction anywhere"), so these mirror
nothing; they are what a production pipeline on this engine needs:
tumbling / sliding / session windows with watermark-based late-data
eviction, and an applyInPandasWithState running counter generalizing the
reference's ``Ref`` global count (FlattenChunksTest.scala:32) into
per-shard managed state.

Determinism note for tests: watermark advancement is per-micro-batch
(computed from the previous batch's max event time), so tests drive the
stream with ``trigger(availableNow=True)`` runs against one checkpoint —
each run is a deterministic batch boundary, and the watermark persists in
the commit log across runs exactly like the reference's DynamoDB
checkpoint persists sequence numbers.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

#: payload schema with an event-time field: ``{"id": 1, "event_ts": "..."}``
TESTMSG_TS_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("event_ts", StringType()),
])


def with_event_time(decoded: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    """Parse the payload's event-time string into a TimestampType column
    (the event-time axis all windows below aggregate on).

    DEAD-LETTER CONTRACT (r12): ``try_to_timestamp``, not
    ``to_timestamp`` — under ANSI mode a single malformed event-time
    string RAISES and TERMINATES the whole streaming query (measured:
    one bad record killed the tumbling-window query), which violates
    the module's rule that a malformed record costs its own row, never
    the pipeline. Unparseable or missing event times become NULL and
    are dropped here, exactly the batch side's null-ts tick contract
    (an event with no position on the time axis joins no window);
    decode_json already dead-letters structurally bad payloads one
    stage earlier."""
    parsed = decoded.withColumn(ts_col, F.try_to_timestamp(F.col(ts_col)))
    return parsed.filter(F.col(ts_col).isNotNull())


def tumbling_counts(events: DataFrame, size: str = "1 minute",
                    watermark: str = "2 minutes",
                    ts_col: str = "event_ts") -> DataFrame:
    """Tumbling event-time window counts with watermark-based state
    eviction. Append output: a window row is emitted exactly once, when
    the watermark passes its end; later-than-watermark records are
    dropped (bounded state — the property that matters at 100 TB/day)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), size).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("sum_id"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "n", "sum_id")
    )


def sliding_counts(events: DataFrame, size: str = "2 minutes",
                   slide: str = "1 minute", watermark: str = "2 minutes",
                   ts_col: str = "event_ts") -> DataFrame:
    """Sliding event-time windows (size/slide replicas per record)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "n")
    )


def session_counts(events: DataFrame, gap: str = "1 minute",
                   watermark: str = "2 minutes",
                   key: str = "partition_key",
                   ts_col: str = "event_ts") -> DataFrame:
    """Session windows per key: a session closes after ``gap`` of
    inactivity and is emitted once the watermark passes session end + gap.
    The streaming twin of the batch gaps-and-islands query
    (q_win_session_batch) — same semantics, state-store incremental."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col(key), F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n")
    )


_COUNT_OUT = StructType([
    StructField("shard_id", StringType()),
    StructField("running_count", LongType()),
    StructField("max_seq", LongType()),
])
_COUNT_STATE = StructType([
    StructField("count", LongType()),
    StructField("max_seq", LongType()),
])


def running_count_stateful(envelope: DataFrame) -> DataFrame:
    """Per-shard running record count as a *custom stateful operator*
    (applyInPandasWithState): the managed-state generalization of the
    reference's ``Ref[Int]`` counter (FlattenChunksTest.scala:32,
    CheckpointOnChunkEndStreamClient.scala:96-100). State (count, max_seq)
    lives in Spark's state store — checkpointed with offsets, restored on
    restart, exactly the Ref-plus-DynamoDB pair of the reference but
    fault-tolerant by construction.

    Update mode: one (shard_id, running_count, max_seq) row per shard per
    micro-batch that touched it.
    """

    def update(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        (count, max_seq) = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            count += len(pdf)
            # NULL-seq transports (kinesis_source emits seq = NULL and
            # carries its position in seq_str) make the column all-NaN;
            # int(NaN) would abort the query — skip like consume_count
            # and order_violations_frame do (r8 review fix)
            s = pdf["seq"].dropna()
            if len(s):
                max_seq = max(max_seq, int(s.max()))
        state.update((count, max_seq))
        yield pd.DataFrame({
            "shard_id": [key[0]],
            "running_count": [count],
            "max_seq": [max_seq],
        })

    return envelope.groupBy("shard_id").applyInPandasWithState(
        update,
        outputStructType=_COUNT_OUT,
        stateStructType=_COUNT_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_available_now(sink_df: DataFrame, checkpoint_dir: str,
                      collected: list | None = None,
                      timeout_s: float = 120.0,
                      output_mode: str | None = None):
    """Drain everything currently available through one deterministic
    batch boundary (trigger availableNow), appending emitted rows to
    ``collected``. Returns when the query self-terminates."""
    rows_out = collected if collected is not None else []

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        rows_out.extend(batch_df.collect())

    writer = sink_df.writeStream.foreachBatch(fb)
    if output_mode:
        writer = writer.outputMode(output_mode)
    q = (
        writer.option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
    except Exception as exc:
        # awaitTermination THROWS StreamingQueryException when the query
        # failed (the r8 review fix: the q.exception() branch below was
        # unreachable for real failures, so q.stop() never ran and the
        # advertised RuntimeError contract was bypassed)
        if q.isActive:
            q.stop()
        raise RuntimeError(str(exc)) from exc
    if q.isActive:
        q.stop()
    if q.exception() is not None:
        raise RuntimeError(str(q.exception()))
    if not finished:
        # a timed-out drain is a FAILURE: returning the partial rows as
        # success would silently truncate the caller's expectations
        # (consume_observed applies the same rule)
        raise TimeoutError(
            f"run_available_now: query still running after {timeout_s}s")
    return rows_out


def stream_stream_interval_join(clicks: DataFrame, purchases: DataFrame,
                                within: str = "10 minutes",
                                watermark: str = "2 minutes",
                                how: str = "inner") -> DataFrame:
    """Stream-stream join within an event-time interval: each purchase
    pairs with every click of the same user whose click_ts is in
    [purchase_ts - within, purchase_ts]. Expects pre-renamed sides:
    clicks(user, click_id, click_ts), purchases(p_user, purchase_id,
    purchase_ts) — the purchase-side key is ``p_user`` so the join
    condition and final projection are unambiguous.

    ``how="left_outer"`` preserves unmatched clicks: a click with no
    purchase inside its interval is emitted with NULL purchase columns —
    but only once the watermark proves no future purchase can match
    (conversion-failure detection as a stream). The null row appears in
    the micro-batch AFTER the watermark passes click_ts + within, since
    batch N evaluates with the watermark computed from batch N-1's max
    event time.

    Watermarks on BOTH sides bound the join state: Spark evicts buffered
    clicks once the purchase-side watermark passes click_ts + within —
    without the time bound the state grows forever (the 100 TB/day
    failure mode). The interval condition also tells the planner how long
    each side must be retained.
    """
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr(f"interval {within}")),
        how,
    ).select("user", "click_id", "click_ts", "purchase_id", "purchase_ts")


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         stream_key: str, dim_key: str) -> DataFrame:
    """Stream-static broadcast enrichment: every micro-batch hash-joins
    against the (re-read per batch, hence updatable) static dimension —
    the no-shuffle lookup-table pattern; the stream side never exchanges.

    Sides are aliased so the common same-name-key invocation
    (stream_key == dim_key, e.g. both 'id') resolves unambiguously
    instead of failing analysis with AMBIGUOUS_REFERENCE (r8 review;
    sink._merge's pattern)."""
    s, d = stream.alias("s"), dim.alias("d")
    return s.join(F.broadcast(d),
                  F.col(f"s.{stream_key}") == F.col(f"d.{dim_key}"), "left")


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           ts_col: str = "event_ts",
                           watermark: str = "10 minutes") -> DataFrame:
    """Streaming deduplication: emit the first occurrence of each key,
    drop re-deliveries arriving within the watermark horizon. State is
    bounded by the watermark (keys older than it are evicted) — the
    standard at-least-once-source → exactly-once-stream repair, and the
    streaming twin of batch q_dedup_latest."""
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


#: payload schema for the CEP stream: type + event time per record
TESTMSG_CEP_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("event_ts", StringType()),
    StructField("event_type", StringType()),
])

_CEP_OUT = StructType([
    StructField("user", StringType()),
    StructField("purchase_id", LongType()),
    StructField("purchase_ts", TimestampType()),
    StructField("view_ts", TimestampType()),
])
_CEP_STATE = StructType([
    StructField("last_view_us", LongType()),
    StructField("last_error_us", LongType()),
])
_CEP_WITHIN_US = 30 * 60 * 1_000_000  # pattern window: 30 minutes
_CEP_UNSET = -(2 ** 63)               # out-of-band "no anchor" sentinel


def pattern_matches_stateful(events: DataFrame) -> DataFrame:
    """Streaming CEP: q_events_pattern's predicate (purchase preceded by
    a view within 30 minutes, no error in between) as a CUSTOM STATEFUL
    operator — per-user anchors (last view ts, last error ts) live in
    the state store, survive micro-batch boundaries and restarts, and
    each match is emitted exactly when its purchase record arrives.
    The second applyInPandasWithState showcase next to
    running_count_stateful: that one carries a counter, this one carries
    the pattern automaton's state.

    Expects (user, event_type, event_ts[timestamp]) — use
    ``with_event_time`` + a projection. Within a batch rows are
    processed in (event_ts, id) order; across batches the state
    carries the anchors, so a view in batch N matches a purchase in
    batch N+1 (asserted in tests/test_streaming_windows.py).

    Scale note: state is TWO BIGINTs per user — O(|active users|)
    regardless of event volume; at production scale add a state TTL
    (timeoutConf) to expire idle users past the pattern window.
    """

    def update(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        # _UNSET is OUT-OF-BAND (r13 temporal sweep): the old sentinel
        # was 0 with truthiness checks, so a view at EXACTLY epoch zero
        # — the canonical default-clock corruption class — set lv=0 and
        # the automaton forgot it (the r6 "in-band sentinels are bugs"
        # rule, found live). INT64_MIN is unreachable as an event time
        # (NaT rows are dropped before the fold).
        lv, le = state.get if state.exists else (_CEP_UNSET, _CEP_UNSET)
        out_id, out_pts, out_vts = [], [], []
        for pdf in pdfs:
            # an unparseable event_ts arrives as NaT (with_event_time
            # nulls it); NaT.value is INT64_MIN and would poison the
            # anchors / fabricate year-1677 matches — drop such rows
            # before updating the automaton (r8 review fix)
            pdf = pdf.dropna(subset=["event_ts"]) \
                .sort_values(["event_ts", "id"])
            for _, row in pdf.iterrows():
                ts_us = int(row["event_ts"].value // 1_000)
                et = row["event_type"]
                if et == "view":
                    lv = ts_us
                elif et == "error":
                    le = ts_us
                elif et == "purchase":
                    # 0 <= ts - view <= window: the lower bound rejects a
                    # LATE purchase whose event time precedes the stored
                    # view (cross-batch out-of-order delivery) — without
                    # it the automaton emits a "view then purchase" match
                    # that never happened in event time
                    if (lv != _CEP_UNSET
                            and 0 <= ts_us - lv <= _CEP_WITHIN_US
                            and (le == _CEP_UNSET or le < lv)):
                        out_id.append(int(row["id"]))
                        out_pts.append(row["event_ts"])
                        out_vts.append(pd.Timestamp(lv * 1_000))
        state.update((lv, le))
        yield pd.DataFrame({
            "user": [key[0]] * len(out_id),
            "purchase_id": out_id,
            "purchase_ts": out_pts,
            "view_ts": out_vts,
        })

    return events.groupBy("user").applyInPandasWithState(
        update,
        outputStructType=_CEP_OUT,
        stateStructType=_CEP_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
