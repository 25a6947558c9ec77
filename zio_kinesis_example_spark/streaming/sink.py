"""foreachBatch keyed upsert sink: maintain a "latest state per key"
table from a stream of updates (streaming CDC compaction).

Reference anchor: the atomic process-then-mark contract
(CheckpointOnChunkEndStreamClient.scala:56-76 — work must be durable
BEFORE the checkpoint advances). Here the micro-batch is the work unit:
a batch's merged snapshot is fully written and the _CURRENT pointer
swapped before Structured Streaming commits the batch's offsets, so a
crash at any point replays the batch against a consistent snapshot.

Idempotency story (at-least-once replay → exactly-once state):
- snapshot versions are keyed by ``batch_id`` — a replayed batch
  rewrites ITS OWN version directory, never a newer one;
- the merge itself is idempotent: re-merging the same delta into a
  snapshot that already contains it changes nothing (delta rows win on
  key collision with themselves);
- the _CURRENT pointer is swapped via tmp+rename (atomic on POSIX), the
  same commit trick as the shard-file producer (source.py).

Scale: the merge is ONE full-outer join per micro-batch, shuffled on the
key; the batch side is deduplicated to one row per key first, so the
join's streamed side is bounded by the trigger size. At warehouse scale
the snapshot would be a table format with row-level merge (the swap-in
is this class's ``_merge``); the orchestration contract — dedupe,
merge, publish, then let the offset commit — is format-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """True iff Spark can sort by a column of this type — an ALLOWLIST
    mirroring RowOrdering.isOrderable (r10 review: a MapType-only
    denylist passed CalendarIntervalType/VariantType through to the
    tiebreak struct, the same AnalysisException class the fix closed
    for maps). Unknown types default to False: they are merely excluded
    from the tiebreak (ties on them break arbitrarily), never a
    crash."""
    # VariantType subclasses AtomicType in PySpark but Spark cannot
    # sort variants (r11 ADVICE: orderBy over a variant raises
    # DATATYPE_MISMATCH.INVALID_ORDERING_TYPE) — exclude it BEFORE the
    # AtomicType allowlist. hasattr-guarded: older PySpark has no
    # VariantType and then nothing can smuggle one in.
    if hasattr(T, "VariantType") and isinstance(dt, T.VariantType):
        return False
    if isinstance(dt, (T.NullType, T.AtomicType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return False


class UpsertSink:
    """``foreachBatch`` callable maintaining latest-state-per-key.

    >>> sink = UpsertSink(state_dir, key="id", seq_col="seq")
    >>> (stream.writeStream.foreachBatch(sink)
    ...  .option("checkpointLocation", ckpt).trigger(availableNow=True)
    ...  .start())
    """

    def __init__(self, base_dir: str, key: str, seq_col: str,
                 keep_versions: int = 2):
        """``keep_versions`` is the GC safety margin: how many snapshot
        generations survive each batch (minimum 2 — current + the replay
        predecessor). Raise it when external readers hold lazy frames
        from ``current()`` across more than one trigger interval; a
        frame whose version is GC'd fails with FileNotFoundException at
        its next action."""
        self.base_dir = base_dir
        self.key = key
        self.seq_col = seq_col
        self.keep_versions = max(2, keep_versions)
        os.makedirs(base_dir, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.base_dir, "_CURRENT")

    def current_version(self) -> str | None:
        try:
            with open(self._pointer_path()) as f:
                return f.read().strip() or None
        except OSError:
            return None

    def current(self, spark: SparkSession) -> DataFrame | None:
        """The committed snapshot, or None before the first batch.

        READER CONTRACT: the returned frame is a LAZY view of one
        snapshot version. Consume it (action or persist-materialize)
        within ``keep_versions - 1`` further batches — after that the
        version directory is GC'd and any later action on the frame
        fails with FileNotFoundException. Long-lived readers should
        raise ``keep_versions`` at construction."""
        v = self.current_version()
        if v is None:
            return None
        return spark.read.parquet(os.path.join(self.base_dir, v))

    # -- the sink ------------------------------------------------------
    # Both steps delegate to the api twins (r9 review: the sink carried
    # near-verbatim copies of api.dedup_latest / api.merge_upsert whose
    # docstrings cite "the UpsertSink rule" — and the copies had already
    # drifted on schema evolution and on temp-name collisions; one
    # implementation keeps the NULL-key and whole-row semantics from
    # forking again).
    def _dedupe_batch(self, batch: DataFrame) -> DataFrame:
        from ..api import dedup_latest

        # FULLY tie-broken ordering (r9 review): seq ties previously
        # kept a shuffle-order-dependent row, so a crash between the
        # pointer swap and the offset commit could replay to a
        # DIFFERENT survivor — violating the byte-identical-replay
        # contract. The struct breaks ties deterministically — built
        # from ORDERABLE columns only (r10 review: a whole-row struct
        # raised AnalysisException for batches carrying a MapType
        # payload, a regression vs the old arbitrary-tie dedupe).
        # Rows identical on every orderable column but differing in a
        # non-orderable one still tie arbitrarily — the pre-r9
        # behavior, now confined to that corner.
        orderable = [c for c, f in zip(batch.columns, batch.schema.fields)
                     if _orderable(f.dataType)]
        tiebreak = F.struct(*[F.col(c) for c in orderable]).desc()
        # SEQ DOMAIN (r13 streaming-adversarial sweep): when seq is a
        # float type, a NaN sequence number sorts GREATEST descending in
        # Spark — one poison record would permanently win every future
        # merge for its key, masking all real updates. An update whose
        # position in the CDC order is NaN/±inf cannot be placed at
        # all, so it is dead-lettered (dropped from the upsert), the
        # smoother's late-row rule applied to sequence numbers.
        # Integer/timestamp/string seqs have no NaN and pass untouched.
        seq_type = dict(zip(batch.columns,
                            [f.dataType for f in batch.schema.fields]))
        if seq_type.get(self.seq_col, None) is not None and                 seq_type[self.seq_col].typeName() in ("double", "float"):
            batch = batch.filter(
                ~F.isnan(F.col(self.seq_col))
                & (F.abs(F.col(self.seq_col))
                   != F.lit(float("inf")))
                | F.col(self.seq_col).isNull())
        return dedup_latest(batch, [self.key],
                            [F.col(self.seq_col).desc(), tiebreak])

    def _merge(self, base: DataFrame | None, delta: DataFrame) -> DataFrame:
        if base is None:
            return delta
        from ..api import merge_upsert

        # NULL-safe key equality, whole-row replacement, explicit
        # column-set contract — see merge_upsert's docstring
        return merge_upsert(base, delta, self.key)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = self._dedupe_batch(batch)
        prev = self.current_version()
        merged = self._merge(self.current(spark), delta)
        version = f"v{batch_id}"
        # Replay guard: if this batch's version directory already exists
        # (pointer swapped, offsets uncommitted, stream restarted — or
        # the pointer still names it), NEVER overwrite it in place: the
        # merge above lazily READS the current snapshot while the write
        # streams out, so an in-place overwrite would consume files it
        # is deleting. Write a fresh generation and swap the pointer to
        # it instead — the atomic-pointer contract makes the extra
        # directory invisible to readers until the swap.
        if os.path.exists(os.path.join(self.base_dir, version)):
            gen = 1
            while os.path.exists(
                    os.path.join(self.base_dir, f"{version}.g{gen}")):
                gen += 1
            version = f"{version}.g{gen}"
        merged.write.parquet(os.path.join(self.base_dir, version))
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer_path())
        self._gc(keep={version, prev})

    def _gc(self, keep: set[str | None]) -> None:
        """Delete superseded snapshot versions, keeping the newest
        ``keep_versions`` directories (always including the current one
        and its immediate predecessor — the replay safety margin:
        Structured Streaming re-runs at most the last uncommitted batch,
        which re-merges onto the predecessor). Without this a long
        stream holds O(batches) full snapshot copies."""
        import shutil

        dirs = [
            name for name in os.listdir(self.base_dir)
            if name.startswith("v")
            and os.path.isdir(os.path.join(self.base_dir, name))
        ]
        dirs.sort(
            key=lambda n: os.path.getmtime(os.path.join(self.base_dir, n)))
        survivors = set(dirs[-self.keep_versions:]) | keep
        for name in dirs:
            if name not in survivors:
                shutil.rmtree(os.path.join(self.base_dir, name),
                              ignore_errors=True)
