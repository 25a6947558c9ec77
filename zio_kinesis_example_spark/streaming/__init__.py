"""Structured Streaming mirror of the reference's streaming semantics
(SURVEY.md §2.1 ops 1-15, §3).

The reference consumes an AWS Kinesis stream via ZIO Streams; the test
environment has no AWS, so the hermetic stand-in is a file-per-shard
directory source (SURVEY.md §7 'Hard parts'): each producer batch appends
one JSON file; records carry (shard_id, partition_key, seq, data) exactly
like the Kinesis record envelope (FIXTURES.md §A2). The source function is
the swap-in point for ``spark.readStream.format("kinesis")`` on a real
cluster.

Semantics parity map:
- sharded stream source (op 1)        → readStream.schema(...).json(dir)
- producer (ops 2-3, 23-24)           → ShardDirProducer (threaded, throttled)
- take / stop-after-N (op 7)          → foreachBatch count + query.stop()
- global processed count (ops 8-9)    → counted in foreachBatch (exact,
                                        per-epoch, replay-safe)
- ordered per-shard fold (ops 10-11)  → per-batch sort on (shard_id, seq)
                                        + monotonicity check
- checkpoint / at-least-once (12-14)  → checkpointLocation offset+commit log
- typed decode errors (ops 16-17)     → from_json null-routing + dead-letter
"""

from .source import (  # noqa: F401
    ENVELOPE_SCHEMA, ShardDirProducer, kafka_reader_options, kafka_source,
    kinesis_reader_options, kinesis_source, shard_source,
)
from .serde import decode_json, decode_json_flagged, TESTMSG_SCHEMA  # noqa: F401
from .consume import (  # noqa: F401
    ConsumeResult, ObservedResult, consume_count, consume_observed,
)
from .observe import MetricsTap, tapped  # noqa: F401
from .sink import UpsertSink  # noqa: F401
from .ann import ivf_index, probe_topk, topk_ingest  # noqa: F401
from .smooth import smooth_stateful  # noqa: F401
