"""Round-5 (fifth wave) pipeline extensions — deliberately tiny: round 5
holds the registry nearly still so the driver's budget certifies the
round-4 backlog (VERDICT r4 item 1). One addition widens the real-codec
family:

- ``q_multimodal_decode_ppm``  encode → decode round-trip through a
                               genuine binary PPM (P6) file. BMP proved
                               fixed-layout parsing (little-endian headers,
                               padded strides, signed orientation); PPM
                               proves the other real-world parse hazard —
                               a variable-length ASCII header tokenized
                               through whitespace runs and '#'-comments.
                               Kernels live in ``multimodal.py`` beside the
                               BMP pair; registration lives here so the
                               unverified-first serve order keeps older
                               backlog ahead of it.

Registered after pipeline_ext4 (registry import order).

Reference parity note: the reference (zio-kinesis-example) has no batch
surface — this module is north-star surface mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, LongType, StructField, StructType,
)

from ..registry import query
from .multimodal import (
    PPM_DECODE_SCHEMA, binary_docs, ppm_decode_batch, ppm_encode_batch,
)


# Oracle mirror of the PPM round trip: the header is a per-class constant
# (class 2's embeds a comment line the decoder must skip), the RGB plane is
# unpadded row-major, and every plane byte is text byte (k mod len) — so
# the layout columns are CASE arithmetic and the sums are cyclic byte sums
# over the ascii text, exactly the q_multimodal_decode_bmp proof pattern.
def _ppm_oracle() -> str:
    w = "CASE doc_id % 3 WHEN 0 THEN 17 WHEN 1 THEN 24 ELSE 31 END"
    h = "CASE doc_id % 3 WHEN 0 THEN 7 WHEN 1 THEN 10 ELSE 13 END"
    hl = "CASE doc_id % 3 WHEN 0 THEN 12 WHEN 1 THEN 13 ELSE 17 END"
    cyc = ("list_sum(list_transform(generate_series(0, {n} - 1), "
           "k -> ascii(substring(text, (k % length(text)) + 1, 1))))")
    return f"""
        SELECT doc_id,
               TRUE AS ppm_ok,
               CAST(({hl}) + 3 * ({w}) * ({h}) AS BIGINT) AS n_bytes,
               CAST({w} AS INT) AS width,
               CAST({h} AS INT) AS height,
               255 AS maxval,
               CAST({hl} AS INT) AS header_len,
               CAST({cyc.format(n=f"({w}) * 3")} AS BIGINT) AS row0_sum,
               CAST({cyc.format(n=f"({w}) * 3 * ({h})")} AS BIGINT)
                   AS pixel_sum
        FROM documents
    """


@query("q_multimodal_decode_ppm", oracle=_ppm_oracle(),
       tags=("multimodal", "north-star"))
def q_multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-format decode #2: encode each document into a genuine binary
    PPM (P6) file (``ppm_encode_batch``), then parse it back with the
    dependency-free decoder (``ppm_decode_batch`` — magic check, then a
    vectorized per-byte state machine tokenizing width/height/maxval
    through arbitrary whitespace and '#'-comment runs).

    The DuckDB oracle recomputes every output column from first
    principles (constant per-class header lengths + cyclic text-byte
    sums), so a hash match proves the tokenizer really parsed the
    header: any off-by-one in the comment skip, token boundary, or
    data-offset placement shifts header_len and both sums. Size class
    2's header embeds a comment, so comment handling sits on the
    hash-checked path.

    Scale shape: two chained ``mapInPandas`` kernels, zero shuffles
    (the BMP plan test's pattern); Arrow batches stream through numpy
    flat-buffer passes, constant memory per task, no per-row Python."""
    ppms = binary_docs(spark, sf_dir).select("doc_id", "payload") \
        .mapInPandas(ppm_encode_batch, schema=StructType([
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]))
    return ppms.mapInPandas(ppm_decode_batch, schema=PPM_DECODE_SCHEMA)
