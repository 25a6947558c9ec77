"""Consumer patterns mirroring the reference's two e2e tests.

- **take / stop-after-N** (op 7, FlattenChunksTest.scala:42): Spark has no
  streaming row-limit trigger, so the idiomatic shape is: count inside
  ``foreachBatch``, signal the driver loop, ``query.stop()`` at threshold.
- **global processed count** (ops 8-9, FlattenChunksTest.scala:32,46,54):
  per-record counting with the count surviving restarts only via
  re-delivery — exactly the reference's Ref semantics (state lives with
  the consumer, offsets with the checkpoint).
- **ordered per-chunk fold** (ops 10-11, CheckpointOnChunkEndStreamClient.
  scala:54-85): each micro-batch is processed sorted by (shard_id, seq);
  per-shard high-water marks verify cross-batch order.
- **at-least-once + bounded re-delivery** (ops 12-14): offsets commit only
  after the batch's effects complete (Spark's micro-batch contract =
  the reference's bracket+ensuring checkpoint, SURVEY.md §3.4); a failure
  mid-batch aborts the query, restart from ``checkpointLocation``
  re-delivers from the last commit. Records processed before the failure
  are counted twice — processed_count ≥ N while distinct ids == N, the
  same invariant the reference's with-errors run exhibits.

The per-record effect layer of :func:`consume_count` iterates on the
driver — deliberately: it is the TEST-HARNESS MIRROR of the reference's
single-process per-record effects (processRecord,
CheckpointOnChunkEndStreamClient.scala:95-101), kept
for counters and failure injection, and NOT the scale path. The scale
path is :func:`consume_observed`: per-record work on executors,
counting via ``df.observe()``, nothing collected. Gap/order detection
is executor-side in both (:func:`order_violations_frame` — only
violation rows ever reach the driver).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import Counter
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def order_violations_frame(
    batch_df: DataFrame, high_water: dict[str, int]
) -> DataFrame:
    """Per-shard forward-gap detection, computed EXECUTOR-side: returns
    only the violation rows (shard_id, prev_seq, seq), so the driver
    collects violations — normally zero rows — never the batch.

    A shard's records must arrive seq-contiguous; a record may repeat
    (at-least-once redelivery, seq ≤ high-water: not a violation) but must
    never skip forward. Within the batch the predecessor comes from a
    per-shard lag window; for each shard's first row it comes from the
    previous batches' high-water mark (``high_water``, a per-shard map of
    size n_shards — broadcast as a literal; at huge shard counts this
    would be a broadcast join against the state store instead). A shard
    with no map entry gets the IMPLICIT initial high-water 0 (matching
    the driver fold's ``last_seq.get(shard, 0)``): producers emit seq 1
    first, so an unseen shard opening at seq > 1 is a head-of-shard gap,
    not a clean start. This is the scale-shape twin of the driver-side
    per-record fold below, which exists to mirror the reference's
    single-process semantics.
    """
    if high_water:
        hw_items = [
            x
            for k, v in high_water.items()
            for x in (F.lit(k), F.lit(v).cast("long"))
        ]
        hw = F.coalesce(
            F.element_at(F.create_map(*hw_items), F.col("shard_id")),
            F.lit(0).cast("long"),
        )
    else:
        hw = F.lit(0).cast("long")
    w = Window.partitionBy("shard_id").orderBy("seq")
    return (
        batch_df.select("shard_id", F.col("seq").cast("long").alias("seq"))
        # transports whose positions are not dense integers (kinesis_source
        # emits seq NULL; the ordering token is seq_str) carry no
        # contiguity contract — skip them explicitly rather than relying
        # on NULL comparisons to filter silently
        .filter(F.col("seq").isNotNull())
        # the effective predecessor is the max of the in-batch lag and
        # the shard's high-water mark (greatest() skips the NULL lag on
        # each shard's first row): a redelivered below-high-water record
        # must not mask the mark and turn its contiguous successor
        # (seq == hw + 1) into a spurious gap report
        .withColumn("prev_seq", F.greatest(F.lag("seq").over(w), hw))
        .filter(F.col("seq") > F.col("prev_seq") + 1)
        .select("shard_id", "prev_seq", "seq")
    )


@dataclass
class ConsumeResult:
    processed: int = 0                       # per-record effects executed (≥ distinct on redelivery)
    ids: Counter = field(default_factory=Counter)
    epochs: int = 0
    last_seq: dict[str, int] = field(default_factory=dict)
    order_violations: list[str] = field(default_factory=list)
    failed: bool = False
    error: str = ""

    @property
    def distinct(self) -> int:
        return len(self.ids)


def consume_count(
    decoded: DataFrame,
    target: int,
    checkpoint_dir: str,
    fail_on_ids: set[int] | None = None,
    trigger_s: float = 0.5,
    timeout_s: float = 180.0,
    result: ConsumeResult | None = None,
) -> ConsumeResult:
    """Run the stream until ``target`` distinct records processed (or
    failure/timeout). ``fail_on_ids`` injects a one-time failure when that
    record is first processed — after its predecessors in (shard, seq)
    order already ran, exercising the redelivery path.

    Pass the same ``result`` (and checkpoint_dir) across calls to model a
    restart: counts accumulate while offsets resume from the commit log.

    TEST-HARNESS MIRROR, NOT THE SCALE PATH: the per-record fold collects
    each micro-batch to the driver because the effects under test mirror
    the reference's single-process semantics; production consumption is
    :func:`consume_observed`. Order/gap detection is executor-side here
    too (:func:`order_violations_frame`).
    """
    state = result if result is not None else ConsumeResult()
    state.failed = False  # counts accumulate across restarts; failure doesn't
    state.error = ""
    fail_pending = set(fail_on_ids or ())
    lock = threading.Lock()

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        # Gap/order detection runs executor-side: only violation rows —
        # normally none — cross to the driver. With the in-band decode
        # form (decode_json_flagged) the detection sees EVERY transport
        # seq including decode failures — on the split form a corrupt
        # record's dead-lettered seq would read as a spurious gap.
        flagged = "decode_ok" in batch_df.columns
        with lock:
            hw_snapshot = dict(state.last_seq)
        viols = order_violations_frame(batch_df, hw_snapshot).collect()
        # TEST-HARNESS MIRROR, NOT THE SCALE PATH: the per-record fold
        # below collects the batch and iterates in driver Python, because
        # the effects under test (counters, one-shot failure injection)
        # mirror the reference's single-process processRecord. Production
        # consumption is consume_observed — executor-side, observe()-
        # counted, nothing collected.
        cols = ["shard_id", "seq", "id"] + (["decode_ok"] if flagged else [])
        rows = (
            batch_df.select(*cols)
            .orderBy("shard_id", "seq")
            .collect()
        )
        with lock:
            state.epochs += 1
            state.order_violations.extend(
                f"{v.shard_id}: gap {v.prev_seq} -> {v.seq}" for v in viols
            )
            for r in rows:
                # transport-level: the high-water advances on every
                # consumed seq, decodable or not; NULL seq (string-
                # ordered transports, kinesis_source) has no contract
                if r.seq is not None:
                    prev = state.last_seq.get(r.shard_id, 0)
                    state.last_seq[r.shard_id] = max(prev, r.seq)
                if flagged and not r.decode_ok:
                    continue          # dead-lettered: no record effects
                # per-record effect (reference processRecord: count + observe)
                state.processed += 1
                state.ids[r.id] += 1
                if r.id in fail_pending:
                    fail_pending.discard(r.id)
                    raise RuntimeError(f"injected failure at id={r.id}")

    query = (
        decoded.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{int(trigger_s * 1000)} milliseconds")
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    deadline = time.monotonic() + timeout_s
    try:
        while time.monotonic() < deadline:
            if not query.isActive:
                break
            with lock:
                done = state.distinct >= target
            if done:
                break
            time.sleep(0.1)
        if query.isActive:
            query.stop()
        try:
            query.awaitTermination(30)
        except StreamingQueryException as e:
            state.failed = True
            state.error = str(e)
        else:
            if query.exception() is not None:
                state.failed = True
                state.error = str(query.exception())
            elif state.distinct < target:
                # a timed-out run is a FAILURE, not a success — the same
                # rule consume_observed and run_available_now enforce
                state.failed = True
                state.error = (
                    f"timeout after {timeout_s}s: {state.distinct}/{target} "
                    "distinct records before the deadline")
    finally:
        try:
            if query.isActive:
                query.stop()
        except Exception:
            pass
    return state


@dataclass
class ObservedResult:
    processed: int = 0      # records through the pipeline (≥ distinct on redelivery)
    sum_id: int = 0
    batches: int = 0
    failed: bool = False
    error: str = ""


def consume_observed(
    decoded: DataFrame,
    checkpoint_dir: str,
    fail_on_ids: set[int] | None = None,
    timeout_s: float = 600.0,
) -> ObservedResult:
    """The PRODUCTION consume path: per-record work stays on the executors.

    Counting rides ``df.observe()`` aggregates delivered through the
    progress listener (streaming/observe.py) — the data never crosses to
    the driver (contrast :func:`consume_count`, the test mirror whose
    driver-side loop exists to run ordered per-record *assertions*). The
    sink is a per-batch noop write inside ``foreachBatch``: full plan
    execution on executors, zero result transfer — swap in the real sink
    (parquet/Kafka/foreachPartition effects) at that line.

    ``fail_on_ids`` injects a one-time failure when a batch containing
    that id is first processed (the reference's with-errors run,
    CheckpointOnChunkEndStreamClient.scala:58-72): detection is a
    distributed filter-count, the query aborts, and a restart with the
    same ``checkpoint_dir`` redelivers only the uncommitted batches.
    The caller owns the pending-id set so it survives restarts.

    Runs with ``availableNow`` — process everything available in
    micro-batches, then terminate (the bounded-ingest bench/backfill
    shape). Returns processed (≥ distinct under redelivery) from the tap.
    """
    import uuid

    from .observe import tapped

    spark = decoded.sparkSession
    pending = fail_on_ids if fail_on_ids is not None else set()
    tap_name = f"consume-{uuid.uuid4().hex[:8]}"
    observed = decoded.observe(
        tap_name, F.count(F.lit(1)).alias("n"), F.sum("id").alias("sum_id")
    )

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        if pending:
            # distributed detection; only the handful of matched ids ever
            # reach the driver (bounded by |fail_on_ids|)
            # cache while a failure is pending: the detection scan and
            # the sink write share one materialization instead of
            # executing the batch's full plan twice
            batch_df.persist()
            try:
                hit = [
                    r.id for r in
                    batch_df.select("id")
                    .filter(F.col("id").isin([int(i) for i in pending]))
                    .collect()
                ]
                if hit:
                    for i in hit:
                        pending.discard(i)
                    raise RuntimeError(
                        f"injected failure at ids={sorted(hit)}")
                batch_df.write.format("noop").mode("overwrite").save()
            finally:
                batch_df.unpersist()
            return
        batch_df.write.format("noop").mode("overwrite").save()

    res = ObservedResult()
    with tapped(spark, tap_name) as tap:
        query = (
            observed.writeStream.foreachBatch(fb)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        from pyspark.errors.exceptions.captured import StreamingQueryException

        try:
            finished = query.awaitTermination(int(timeout_s))
        except StreamingQueryException as e:
            res.failed = True
            res.error = str(e)
        else:
            if query.exception() is not None:
                res.failed = True
                res.error = str(query.exception())
            elif not finished:
                # awaitTermination(timeout) returning False means the query
                # is still running: a hung/partial run is a FAILURE, not a
                # success with whatever counts happened to accumulate.
                res.failed = True
                res.error = f"timeout after {timeout_s}s"
        finally:
            with contextlib.suppress(Exception):
                if query.isActive:
                    query.stop()
        # wait for THIS query's terminated event: the ordered listener
        # bus then guarantees all its progress is folded in (the settle
        # heuristic alone can undercount when the whole bus lags)
        if not tap.wait_terminated(str(query.runId), timeout_s=15):
            tap.wait_stable("n", settle_s=0.5, timeout_s=5)
        res.processed = int(tap.total("n"))
        res.sum_id = int(tap.total("sum_id"))
        res.batches = tap.batches
    return res


def retry(fn, retry_on=(Exception,), max_attempts: int = 5,
          base_delay_s: float = 0.1, factor: float = 2.0,
          sleep=time.sleep):
    """Composite retry policy: retry only on ``retry_on`` exception types,
    at most ``max_attempts`` times, exponential backoff from
    ``base_delay_s`` — the intersection-of-schedules semantics of the
    reference (Schedule.doWhile && Schedule.recurs(5) &&
    Schedule.exponential, TestUtils.scala:45-50); non-matching exceptions
    propagate immediately (the doWhile arm), exhausted retries re-raise
    the last error.
    """
    attempt = 0
    while True:
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203 — the point is the policy
            attempt += 1
            if attempt > max_attempts:
                raise
            sleep(base_delay_s * (factor ** (attempt - 1)))
        # any other exception type propagates immediately
