"""Typed JSON decode with an explicit error channel.

Mirror of the reference serde (TestMsgJsonSerde.scala:12-23): payload
bytes → string → typed record, where decode failure is a *value* (typed
error), not an exception. In Spark: ``from_json`` yields null on malformed
input; we route those rows to a dead-letter DataFrame instead of crashing
the stream — the declarative analogue of circe's Either channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

#: ``case class TestMsg(id: Int)`` (reference TestMsg.scala:3).
TESTMSG_SCHEMA = StructType([StructField("id", IntegerType())])

_CORRUPT = "_corrupt_payload"


def _decode_with_flag(df: DataFrame, schema: StructType):
    """Shared decode scaffold for :func:`decode_json` and
    :func:`decode_json_flagged` (r8 review: the subtlest semantics in
    this module — the corrupt-record channel, the required-first-field
    rule, the tombstone rule — must have ONE definition). Returns
    (decoded_with_msg, ok_predicate).

    - PERMISSIVE from_json yields a struct of nulls on malformed input,
      so the explicit corrupt-record column is the real typed error
      channel.
    - data IS NULL (e.g. a Kafka tombstone) must dead-letter too:
      from_json(NULL) is a null struct whose corrupt field is null, so
      the corrupt-record check alone would route it to the valid side
      as an all-null payload row.
    - The schema's FIRST field is required (TestMsg.id is a
      non-optional constructor field): structurally valid JSON lacking
      it is a decode FAILURE.
    """
    schema_with_err = StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType())]
    )
    decoded = df.withColumn(
        "msg",
        F.from_json(
            F.col("data"), schema_with_err,
            {"columnNameOfCorruptRecord": _CORRUPT},
        ),
    )
    required = schema.fields[0].name
    ok = (F.col("data").isNotNull()
          & F.col(f"msg.{_CORRUPT}").isNull()
          & F.col(f"msg.{required}").isNotNull())
    return decoded, ok


def decode_json(df: DataFrame, schema: StructType = TESTMSG_SCHEMA
                ) -> tuple[DataFrame, DataFrame]:
    """(valid, dead_letter) split of an envelope stream.

    valid: envelope columns + decoded payload fields.
    dead_letter: undecodable rows with the raw payload preserved for
    replay/inspection (at-least-once: nothing is silently dropped).

    Subtlety: PERMISSIVE ``from_json`` yields a struct of nulls (not a
    null struct) on malformed input, so null-checking the struct is not a
    decode-error test. The explicit corrupt-record column is the real
    typed error channel — the circe ``Either[Error, TestMsg]`` analogue
    (TestMsgJsonSerde.scala:17-22).

    The schema's FIRST field is treated as required (TestMsg.id is a
    non-optional constructor field): structurally valid JSON that lacks
    it ('{}', '{"foo": 1}', 'null') is a decode FAILURE — circe would
    Left-fail a missing required field, and an id-less "valid" row would
    otherwise flow NULL keys into downstream keyed sinks.
    """
    decoded, ok = _decode_with_flag(df, schema)
    valid = (
        decoded.filter(ok)
        .select("*", "msg.*")
        .drop("msg", _CORRUPT)
    )
    dead = decoded.filter(~ok).drop("msg")
    return valid, dead


def decode_json_flagged(df: DataFrame, schema: StructType = TESTMSG_SCHEMA
                        ) -> DataFrame:
    """Single-stream variant of :func:`decode_json`: every envelope row
    stays in-band, with a ``decode_ok`` flag and NULL payload fields on
    failures.

    Use this form when the consumer asserts TRANSPORT-level invariants
    (per-shard seq contiguity): the split form removes dead-lettered
    rows' seqs from the valid stream, so every corrupt record would
    read as a spurious forward gap. consume_count detects the flag —
    gap/high-water tracking runs over all rows, per-record effects only
    over the decodable ones.
    """
    decoded, ok = _decode_with_flag(df, schema)
    return (
        decoded.withColumn("decode_ok", ok)   # while msg still exists
        .select("*", "msg.*")
        .drop("msg", _CORRUPT)
    )
