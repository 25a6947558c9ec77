"""Hermetic sharded streaming source + producer.

Producer mirrors the reference's ``putRecordsEmitter`` (TestUtils.scala:
73-93): synthesize numbered records 1..max in batches, JSON payload
``{ "id": <i> }`` (TestUtils.scala:43), partition key ``key$i``
(TestUtils.scala:80), key→shard routing by hash, throttled between batches
(TestUtils.scala:86-88), run concurrently with the consumer
(FlattenChunksTest.scala:34 fork → a Python thread here).

Scale note: the file-per-batch layout is only the AWS-free test double; at
scale this is ``format("kinesis")``/``format("kafka")`` with one input
partition per shard — which is exactly how records here carry their shard
identity, so downstream code is source-agnostic.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

#: Kinesis-like record envelope (FIXTURES.md §A2).
ENVELOPE_SCHEMA = StructType([
    StructField("shard_id", StringType()),
    StructField("partition_key", StringType()),
    StructField("seq", LongType()),
    StructField("data", StringType()),
])


def route_shard(partition_key: str, n_shards: int) -> int:
    """Deterministic key→shard routing (service-side MD5 hashing in
    Kinesis, TestUtils.scala:80 comment in SURVEY §3.3; crc32 here)."""
    return zlib.crc32(partition_key.encode()) % n_shards


class ShardDirProducer:
    """Writes record batches as JSON files into a source directory.

    One file per produced batch (the 'chunk' I/O unit, reference op 2);
    per-shard ``seq`` is monotonically increasing — the checkpointable
    position (Record.checkpoint analogue).
    """

    def __init__(self, source_dir: str, n_shards: int = 8,
                 batch_size: int = 500, throttle_s: float = 0.0,
                 corrupt_every: int | None = None,
                 payload_fn=None):
        self.source_dir = source_dir
        self.n_shards = n_shards
        self.batch_size = batch_size
        self.throttle_s = throttle_s
        self.corrupt_every = corrupt_every
        self.payload_fn = payload_fn  # (i) -> dict, overrides the wire format
        self._seqs = [0] * n_shards
        self._batch_no = 0
        os.makedirs(source_dir, exist_ok=True)

    def record_json(self, i: int) -> str:
        """The reference's wire format: ``{ "id": <i> }`` (TestUtils.scala:43).
        ``payload_fn`` extends it (e.g. an event_ts field for the windowed
        consumers in streaming/windows.py)."""
        if self.payload_fn is not None:
            return json.dumps(self.payload_fn(i))
        return json.dumps({"id": i})

    def produce(self, start: int, count: int) -> int:
        """Produce records [start, start+count) as one batch file.

        Returns the next start index. Writes are atomic (tmp+rename) so the
        streaming file source never reads partial files.
        """
        lines = []
        for i in range(start, start + count):
            key = f"key{i}"
            shard = route_shard(key, self.n_shards)
            self._seqs[shard] += 1
            data = self.record_json(i)
            if self.corrupt_every and i % self.corrupt_every == 0:
                data = "{ not json !"  # malformed payload (decode-error path)
            lines.append(json.dumps({
                "shard_id": f"shard-{shard:03d}",
                "partition_key": key,
                "seq": self._seqs[shard],
                "data": data,
            }))
        tmp = os.path.join(self.source_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        final = os.path.join(self.source_dir, f"batch-{self._batch_no:06d}.json")
        os.rename(tmp, final)
        self._batch_no += 1
        return start + count

    def produce_all(self, max_records: int, start: int = 1) -> None:
        """Reference producer loop: batches of batch_size with an
        inter-batch throttle (TestUtils.scala:79-88)."""
        i = start
        while i <= max_records:
            n = min(self.batch_size, max_records - i + 1)
            i = self.produce(i, n)
            if self.throttle_s:
                time.sleep(self.throttle_s)

    def fork(self, max_records: int) -> threading.Thread:
        """Run the producer concurrently with the consumer (the reference
        forks it as a fiber, FlattenChunksTest.scala:34)."""
        t = threading.Thread(target=self.produce_all, args=(max_records,),
                             daemon=True)
        t.start()
        return t


def shard_source(spark: SparkSession, source_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded stream of envelope records from the shard directory
    (reference op 1: DynamicConsumer.shardedStream). Schema declared, never
    inferred."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def kinesis_reader_options(stream_name: str, region: str = "us-east-1",
                           initial_position: str = "trim_horizon",
                           endpoint_url: str | None = None) -> dict[str, str]:
    """Option map for the ``format("kinesis")`` reader — split out from
    :func:`kinesis_source` so the construction is unit-testable without
    the connector jar (no AWS in the hermetic test environment)."""
    opts = {
        "streamName": stream_name,
        "region": region,
        "initialPosition": initial_position,
    }
    if endpoint_url:
        opts["endpointUrl"] = endpoint_url
    return opts


def kinesis_source(spark: SparkSession, stream_name: str,
                   region: str = "us-east-1",
                   initial_position: str = "trim_horizon",
                   endpoint_url: str | None = None) -> DataFrame:
    """The real-Kinesis twin of :func:`shard_source` (reference op 1,
    DynamicConsumer.shardedStream, FlattenChunksTest.scala:35-40):
    requires the spark-sql-kinesis connector jar on the cluster (not
    available in this hermetic environment — tests use shard_source).
    Both sources emit the same envelope columns, with one contract
    difference consumers must honor: ``seq`` is NULL here (Kinesis
    positions are ~56-digit strings, carried in ``seq_str``; dense
    +1 contiguity is a property of the hermetic producer only), so
    consume_count's high-water fold and order_violations_frame skip
    NULL-seq rows rather than asserting gap semantics Kinesis never
    promised.

    Consumer offsets live in Spark's checkpointLocation rather than a
    DynamoDB lease table — the engine's replacement for the KCL
    checkpoint story (SURVEY.md §3.4).
    """
    reader = spark.readStream.format("kinesis").options(
        **kinesis_reader_options(stream_name, region, initial_position,
                                 endpoint_url)
    )
    # connector emits (data, streamName, partitionKey, shardId,
    # sequenceNumber, approximateArrivalTimestamp); normalize to the
    # envelope contract. Kinesis sequence numbers are ~56-digit decimal
    # strings — they overflow BIGINT and DECIMAL(38), so the raw string
    # is the ordering token (AWS keeps them fixed-width and increasing
    # within a shard, so lexicographic order is numeric order) and the
    # dense +1 ``seq`` is NULL: contiguity-gap semantics are a property
    # of the hermetic producer, not of Kinesis.
    df = reader.load()
    from pyspark.sql import functions as F
    return df.select(
        F.col("shardId").alias("shard_id"),
        F.col("partitionKey").alias("partition_key"),
        F.lit(None).cast("long").alias("seq"),
        F.col("sequenceNumber").cast("string").alias("seq_str"),
        F.col("data").cast("string").alias("data"),
    )


def kafka_reader_options(topic: str, bootstrap_servers: str,
                         starting_offsets: str = "earliest",
                         max_offsets_per_trigger: int | None = None
                         ) -> dict[str, str]:
    """Option map for the ``format("kafka")`` reader — split out from
    :func:`kafka_source` so the construction is unit-testable without the
    spark-sql-kafka connector jar (no broker in the hermetic test
    environment)."""
    opts = {
        "subscribe": topic,
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_source(spark: SparkSession, topic: str,
                 bootstrap_servers: str = "localhost:9092",
                 starting_offsets: str = "earliest",
                 max_offsets_per_trigger: int | None = None) -> DataFrame:
    """The Kafka twin of :func:`kinesis_source` (reference op 1 maps to a
    partitioned log either way; SURVEY.md §3.3's shard ≙ partition).
    Requires spark-sql-kafka on the cluster; everything downstream is
    identical because the output is normalized to the same envelope
    columns as :func:`shard_source`:

      shard_id       ← kafka partition (ordered unit, like a shard)
      partition_key  ← record key
      seq            ← NULL (see below); seq_str ← zero-padded offset
      data           ← value decoded as UTF-8 JSON

    ``seq`` is NULL here like the Kinesis path (r8 review fix): Kafka
    offsets are monotone per partition but legitimately NON-contiguous
    (transactional commit/abort markers occupy offsets; compaction
    removes records), so running them through the dense +1 contiguity
    checks (order_violations_frame, consume_count's high-water fold)
    would report spurious gaps on a healthy stream — contiguity is a
    property of the hermetic producer only. The ordering token is
    ``seq_str``: the offset zero-padded to 20 digits, so lexicographic
    order is numeric order (the Kinesis fixed-width convention; a raw
    string would sort "10" < "9").

    ``maxOffsetsPerTrigger`` is the pacing knob mirroring the file
    source's ``maxFilesPerTrigger`` (reference op 23 rate limiting).
    Offsets live in Spark's checkpointLocation, not the broker's consumer
    group — same at-least-once replay story as the Kinesis path.
    """
    reader = spark.readStream.format("kafka").options(
        **kafka_reader_options(topic, bootstrap_servers, starting_offsets,
                               max_offsets_per_trigger)
    )
    df = reader.load()
    from pyspark.sql import functions as F
    return df.select(
        F.col("partition").cast("string").alias("shard_id"),
        F.col("key").cast("string").alias("partition_key"),
        F.lit(None).cast("long").alias("seq"),
        F.lpad(F.col("offset").cast("string"), 20, "0").alias("seq_str"),
        F.col("value").cast("string").alias("data"),
    )
