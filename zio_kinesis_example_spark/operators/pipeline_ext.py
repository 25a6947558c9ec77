"""Round-4 pipeline extensions — one new operator per north-star family,
deepening the existing surface without churning it:

- ``q_dedup_spans``      repeated cross-document n-gram SPAN detection (the
                         substring-level dedup signal, vs the whole-doc
                         near-dup verdicts of the MinHash/SimHash family);
- ``q_text_containment`` asymmetric shingle containment |A∩B|/|A| (doc-in-
                         doc / near-superset detection — Jaccard's
                         directional twin);
- ``q_curate_drift_chi2`` per-source language-mix drift audit (chi-square
                         against the corpus mix) for data-card QA;
- ``q_embed_pq``         product-quantization code assignment (the ADC
                         storage layout IVF indexes pair with k-means);
- ``q_multimodal_wav_decode`` REAL RIFF/WAVE PCM codec round trip (the
                         audio sibling of the BMP image codec).

Registered LAST (registry import order) so the driver's budgeted
correctness pass certifies the round-3 backlog before spending slots here.

Reference parity note: the reference (zio-kinesis-example) has no batch
surface at all — this module, like the rest of the batch inventory, is the
north-star surface mandated by BASELINE.json, not a port.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, LongType, StructField, StructType,
)
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query
from .exact import measure_domain

# --------------------------------------------------------------------------
# q_dedup_spans — repeated cross-document span detection
# --------------------------------------------------------------------------
# Span length 8 terms: long enough that sharing one is strong evidence of
# copied text (boilerplate, mirrored paragraphs), short enough to occur in
# these ~10-100-term fixture docs. Production substring dedup uses ~50-token
# spans over a suffix-array/Bloom pass; this is the same signal computed
# relationally: every span POSITION is a row (not distinct — a doc repeating
# a span internally counts each occurrence), a span is "duplicated" when it
# appears in >= 2 distinct docs, and each doc reports how much of its text
# sits under duplicated spans.
_SPAN_K = 8


@query(
    "q_dedup_spans",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS terms
                   FROM documents),
        sp AS (SELECT doc_id,
                      array_to_string(terms[i:i+{_SPAN_K - 1}], ' ') AS span
               FROM t, unnest(CASE WHEN len(terms) >= {_SPAN_K}
                              THEN generate_series(1, len(terms) - {_SPAN_K - 1})
                              ELSE [] END) AS u(i)),
        dup AS (SELECT span FROM sp
                GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2),
        agg AS (SELECT sp.doc_id,
                       COUNT(*) AS n_spans,
                       SUM(CASE WHEN dup.span IS NOT NULL THEN 1 ELSE 0 END)
                           AS n_dup_spans
                FROM sp LEFT JOIN dup ON sp.span = dup.span
                GROUP BY sp.doc_id)
        SELECT t.doc_id,
               CAST(COALESCE(agg.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(agg.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
               CASE WHEN COALESCE(agg.n_spans, 0) > 0
                    THEN round(CAST(agg.n_dup_spans AS DOUBLE)
                               / agg.n_spans, 6)
                    ELSE 0.0 END AS dup_share
        FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id
    """,
    tags=("dedup", "text", "north-star"),
)
def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span report: for every doc, how many of its
    8-term spans also appear in at least one OTHER document (substring-
    level duplication — the signal behind suffix-array training-data
    dedup, computed relationally).

    Scale shape: one span-keyed partial-agged groupBy finds the shared
    spans (the only full shuffle — partial aggregation collapses each
    partition's repeats before the exchange); the duplicated-span set is
    a small fraction of the corpus and BROADCASTs back into the exploded
    span stream, so the corpus-side rows never shuffle for the join. The
    final per-doc rollup re-aggregates the already-doc-partitioned
    stream. At 100 TB the broadcast becomes a Bloom-filter semi-join
    (same plan shape, approximate membership, verified second pass).
    """
    from ..api import repeated_spans

    d = load(spark, sf_dir, "documents")
    return repeated_spans(d, "text", "doc_id", k=_SPAN_K, min_docs=2)


# --------------------------------------------------------------------------
# q_text_containment — asymmetric shingle containment
# --------------------------------------------------------------------------


@query(
    "q_text_containment",
    oracle="""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS terms
                   FROM documents),
        s AS (SELECT doc_id,
                     list_distinct(CASE WHEN len(terms) >= 3
                       THEN list_transform(generate_series(1, len(terms) - 2),
                                           i -> array_to_string(terms[i:i+2], ' '))
                       ELSE [array_to_string(terms, ' ')] END) AS sh
              FROM t),
        -- contentless docs are EXCLUDED (r9 review — api.containment_
        -- pairs' r8 rule applied to this oracle-paired twin too): an
        -- empty text's single '' shingle would pair every such doc
        -- with every other at cont = 1.0, ~m^2/2 bogus rows
        e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
              WHERE NOT (len(sh) = 1 AND sh[1] = '')),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     COUNT(*) AS n_common,
                     MIN(a.n) AS na, MIN(b.n) AS nb
              FROM e a JOIN e b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
               CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
               round(CAST(n_common AS DOUBLE) / na, 6) AS cont_ab,
               round(CAST(n_common AS DOUBLE) / nb, 6) AS cont_ba
        FROM p
        WHERE n_common * 2 >= na OR n_common * 2 >= nb
    """,
    tags=("text", "dedup", "north-star"),
)
def q_text_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-shingle containment |A∩B|/|A| for candidate pairs —
    the directional complement of q_dedup_ngram_jaccard: a short doc
    fully embedded in a long one scores low Jaccard but containment ≈ 1
    (quote farms, wrapper pages, partial mirrors).

    The >= 0.5 keep-filter is stated as exact integer arithmetic
    (``2·n_common >= n``) so the boundary never touches float rounding.
    Scale shape: identical to the Jaccard ground-truth path — shingle-
    keyed self-join (only docs sharing a shingle ever pair), sizes
    carried through the join key's functional dependency; at corpus
    scale the pair stage runs per LSH bucket instead (q_dedup_minhash's
    banding bounds Σ|bucket|²).
    """
    from ..api import containment_from_exploded
    from .llm_dedup import _with_shingles

    # contentless docs excluded (r9 review: mirrors the oracle and
    # api.containment_pairs — the cached shingle frame represents an
    # empty text as the single '' shingle, which would otherwise pair
    # quadratically at cont = 1.0)
    e = (
        _with_shingles(spark, sf_dir)
        .filter(~((F.size("shingles") == 1)
                  & (F.element_at("shingles", 1) == "")))
        .select(
            F.col("doc_id").alias("__id"),
            F.size("shingles").cast("long").alias("__n"),
            F.explode("shingles").alias("__g"),
        )
    )
    return containment_from_exploded(e, threshold=0.5) \
        .withColumnRenamed("id_a", "doc_a") \
        .withColumnRenamed("id_b", "doc_b")


# --------------------------------------------------------------------------
# q_curate_drift_chi2 — language-mix drift per source
# --------------------------------------------------------------------------
# Critical value chi2(dof=4, alpha=0.05) — the fixture corpus has 5
# languages; stated as a literal so the flag is a pure comparison.
_CHI2_CRIT = 9.487729


@query(
    "q_curate_drift_chi2",
    oracle=f"""
        WITH m AS (SELECT source, lang, COUNT(*) AS obs
                   FROM documents GROUP BY source, lang),
        lt AS (SELECT lang, SUM(obs) AS lang_tot FROM m GROUP BY lang),
        st AS (SELECT source, SUM(obs) AS src_tot FROM m GROUP BY source),
        g  AS (SELECT SUM(obs) AS grand FROM m),
        grid AS (SELECT st.source, st.src_tot, lt.lang, lt.lang_tot,
                        COALESCE(m.obs, 0) AS obs, g.grand
                 FROM st CROSS JOIN lt CROSS JOIN g
                 LEFT JOIN m ON m.source = st.source AND m.lang = lt.lang),
        terms AS (SELECT source, src_tot,
                         lang,
                         ((obs - CAST(src_tot * lang_tot AS DOUBLE) / grand)
                          * (obs - CAST(src_tot * lang_tot AS DOUBLE) / grand))
                         / (CAST(src_tot * lang_tot AS DOUBLE) / grand) AS term
                  FROM grid)
        SELECT source,
               CAST(MIN(src_tot) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS INT) AS n_langs,
               round(list_reduce(
                   array_agg(term ORDER BY lang), (x, y) -> x + y), 6)
                   AS chi2,
               list_reduce(array_agg(term ORDER BY lang), (x, y) -> x + y)
                   > {_CHI2_CRIT} AS drifted
        FROM terms GROUP BY source
    """,
    tags=("curation", "stats", "north-star"),
)
def q_curate_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language-mix drift: chi-square of each source's lang
    histogram against the corpus-wide mix — the data-card QA check that
    catches a crawler or feed whose language composition silently shifted
    (next to q_curate_mix_report's plain shares).

    DETERMINISM: all counts are exact BIGINTs; the float chi-square terms
    are computed with one identical expression per cell and then summed
    in EXPLICIT lang order via an ordered fold (Spark ``aggregate`` over
    a sorted struct array ≡ DuckDB ``list_reduce`` over ``array_agg(...
    ORDER BY lang)`` — the q_ts_ewma technique), so the float op chain is
    identical on both engines and the hash matches bit-for-bit.

    Scale shape: the contingency matrix is |sources|×|langs| — tiny at
    any corpus size — so everything after the one partial-agged groupBy
    over the corpus is broadcast arithmetic on a bounded frame.
    """
    from ..api import mix_drift_chi2

    d = load(spark, sf_dir, "documents")
    return mix_drift_chi2(d, "source", "lang", critical=_CHI2_CRIT).select(
        "source",
        F.col("n_rows").alias("n_docs"),
        F.col("n_classes").alias("n_langs"),
        "chi2", "drifted",
    )


# --------------------------------------------------------------------------
# q_embed_pq — product-quantization code assignment
# --------------------------------------------------------------------------
from .llm_similarity import _COS_SCALE as _PQ_SCALE  # noqa: E402  # ONE quantization rule (r8 review)
from .llm_similarity import _QUANT as _PQ_QUANT  # noqa: E402  # and ONE spelling of it (r9 review)
from .llm_similarity import EMB_VALID_SQL, emb_table  # noqa: E402  # malformed-vector contract (r12)
# subspace count is FIXED at two 32-d halves (d0/d1 on both engines) —
# a tunable-looking _PQ_M constant was dead code (r9 review)
_PQ_K = 16              # centroids per subspace
_PQ_SUBDIM = 32


def _pq_oracle() -> str:
    def dist(vlo: int, vhi: int) -> str:
        return (f"list_sum(list_transform(list_zip(e.v[{vlo}:{vhi}], "
                f"c.cv[{vlo}:{vhi}]), p -> (p[1] - p[2]) * (p[1] - p[2])))")

    return f"""
        WITH {EMB_VALID_SQL},
        e AS (SELECT vec_id,
                          list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * {_PQ_SCALE}.0) AS BIGINT))
                              AS v
                   FROM emb_valid),
        c AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                         AS cid, v AS cv
              FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_PQ_K})),
        d AS (SELECT e.vec_id, c.cid,
                     {dist(1, _PQ_SUBDIM)} AS d0,
                     {dist(_PQ_SUBDIM + 1, 2 * _PQ_SUBDIM)} AS d1
              FROM e CROSS JOIN c)
        SELECT vec_id,
               min({{'d': d0, 'c': cid}}).c AS code0,
               min({{'d': d1, 'c': cid}}).c AS code1,
               CAST(min(d0) + min(d1) AS BIGINT) AS qerr
        FROM d GROUP BY vec_id
    """


@query("q_embed_pq", oracle=_pq_oracle(),
       tags=("similarity", "embedding", "quantize", "north-star"))
def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization assignment: split each 64-d embedding into
    two 32-d subspaces and code each against a 16-entry per-subspace
    codebook — the 8-bit-per-vector ADC layout IVF indexes store
    (q_embed_kmeans is the trained-codebook path; here the codebook is
    the deterministic first-16-by-vec_id sample so the oracle can
    replay assignment exactly).

    DETERMINISM (q_embed_kmeans' rule): floor(x·1e6) integer
    quantization makes every distance an exact BIGINT; argmin ties
    break to the lowest centroid id on both engines (min over (d, cid)
    structs).

    Scale shape: the codebook is O(K·dim) driver state embedded as
    literals, so assignment is a single stateless scan — per-row JVM
    folds over literal arrays, no join, no shuffle, no Python. This is
    exactly how PQ assignment runs at 100 TB: codebooks broadcast,
    codes computed map-side, 8 bytes out per vector.
    """
    from ..api import pq_assign

    emb = emb_table(spark, sf_dir)
    # _QUANT: the ONE spelling of the quantization transform (r9
    # review: this was a third inline copy next to llm_similarity._QUANT
    # and api.pq_assign's internal one)
    q = emb.select("vec_id", F.expr(_PQ_QUANT).alias("v"))
    cents = [r["v"] for r in q.orderBy("vec_id").limit(_PQ_K).collect()]
    books = [[c[:_PQ_SUBDIM] for c in cents],
             [c[_PQ_SUBDIM:] for c in cents]]
    return pq_assign(emb, "embedding", "vec_id", books,
                     scale=_PQ_SCALE).select(
        "vec_id",
        F.col("code_0").alias("code0"),
        F.col("code_1").alias("code1"),
        "qerr",
    )


# --------------------------------------------------------------------------
# q_multimodal_wav_decode — real RIFF/WAVE PCM codec round trip
# --------------------------------------------------------------------------
# Three size/format classes by doc_id % 3: (frames, sample_rate); channel
# count alternates by doc_id % 2. A 7-byte "JUNK" chunk sits between fmt
# and data so the decoder must run a REAL chunk walk honoring RIFF's
# odd-size pad rule — a reader that assumes a fixed layout, skips the pad
# byte, or hardcodes the data offset produces different sums. PCM bytes
# are consecutive text bytes taken cyclically (lo, hi of each little-
# endian int16 are DIFFERENT bytes, so byte-order mistakes are caught).
_WAV_CLASSES = ((120, 8000), (200, 16000), (321, 22050))
_WAV_JUNK = 7           # odd on purpose: exercises the RIFF pad rule
_WAV_PREFIX = 12 + 8 + 16 + 8 + _WAV_JUNK + 1 + 8  # bytes before PCM data

WAV_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("wav_ok", BooleanType()),
    StructField("n_bytes", LongType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("bits", IntegerType()),
    StructField("n_frames", LongType()),
    StructField("first_sample", LongType()),
    StructField("abs_energy", LongType()),
])


def wav_encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, payload=text bytes) → (doc_id, payload=real WAV bytes):
    RIFF header, canonical 16-byte PCM fmt chunk, a padded JUNK chunk,
    then interleaved little-endian int16 samples whose bytes are the
    text bytes taken cyclically (byte 2k = lo, byte 2k+1 = hi)."""
    import struct

    import numpy as np

    for pdf in batches:
        from .multimodal import _flat_batch

        buf, starts, lens = _flat_batch(pdf["payload"])
        doc_id = pdf["doc_id"].to_numpy()
        out: list = [None] * len(doc_id)
        for c, (frames, rate) in enumerate(_WAV_CLASSES):
            for ch in (1, 2):
                sel = np.nonzero((doc_id % 3 == c) & (doc_id % 2 == ch - 1))[0]
                if len(sel) == 0:
                    continue
                data_bytes = frames * ch * 2
                k = np.arange(data_bytes, dtype=np.int64)
                # empty-payload guard: see bmp_encode_batch
                pcm = buf[starts[sel][:, None]
                          + (k[None, :] % np.maximum(lens[sel], 1)[:, None])
                          ].astype(np.uint8)
                pcm[lens[sel] == 0] = 0
                riff_size = 4 + (8 + 16) + (8 + _WAV_JUNK + 1) + 8 + data_bytes
                hdr = struct.pack(
                    "<4sI4s" "4sIHHIIHH" "4sI", b"RIFF", riff_size, b"WAVE",
                    b"fmt ", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16,
                    b"JUNK", _WAV_JUNK,
                )
                junk_body = bytes(range(_WAV_JUNK)) + b"\x00"  # + pad byte
                data_hdr = struct.pack("<4sI", b"data", data_bytes)
                head = np.frombuffer(hdr + junk_body + data_hdr, dtype=np.uint8)
                files = np.concatenate(
                    [np.broadcast_to(head, (len(sel), len(head))), pcm], axis=1)
                for j, i in enumerate(sel):
                    out[i] = files[j].tobytes()
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def wav_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real RIFF parse, vectorized: magic checks, then a bounded chunk
    WALK (id + little-endian size, cursor += 8 + size + pad) that finds
    ``fmt `` and ``data`` wherever they sit — unknown chunks (JUNK here)
    are skipped by size like any RIFF reader. PCM samples are decoded as
    little-endian int16 and reduced to an exact integer |sample| energy.
    Handles any canonical-PCM WAV, not just this module's encoder output
    (tests decode a hand-written fixture)."""
    import numpy as np

    for pdf in batches:
        from .multimodal import _flat_batch

        buf, starts, lens = _flat_batch(pdf["payload"])
        # guard pad: fixed-offset header gathers below must stay in
        # bounds even when EVERY payload in the batch is shorter than a
        # header (the ok masks discard whatever the padded reads return)
        buf = np.concatenate([buf, np.zeros(64, dtype=np.int64)])
        n = len(starts)
        has_riff = lens >= 12
        base = np.where(has_riff, starts, 0)

        def tag_at(off):
            """uint32 view of the 4 bytes at per-doc offset ``off``."""
            return (buf[base + off] | (buf[base + off + 1] << 8)
                    | (buf[base + off + 2] << 16)
                    | (buf[base + off + 3] << 24))

        RIFF = 0x46464952
        WAVE = 0x45564157
        FMT = 0x20746D66
        DATA = 0x61746164
        ok = has_riff & (tag_at(0) == RIFF) & (tag_at(8) == WAVE)

        # bounded vectorized chunk walk (well-formed files have few
        # chunks; 16 guards against adversarial payloads)
        cursor = np.where(ok, np.int64(12), lens)  # failed docs: no walk
        fmt_off = np.full(n, -1, dtype=np.int64)
        data_off = np.full(n, -1, dtype=np.int64)
        data_size = np.zeros(n, dtype=np.int64)
        for _ in range(16):
            active = ok & (cursor + 8 <= lens)
            if not active.any():
                break
            cur = np.where(active, cursor, 0)
            cid = (buf[base + cur] | (buf[base + cur + 1] << 8)
                   | (buf[base + cur + 2] << 16) | (buf[base + cur + 3] << 24))
            csize = (buf[base + cur + 4] | (buf[base + cur + 5] << 8)
                     | (buf[base + cur + 6] << 16)
                     | (buf[base + cur + 7] << 24))
            in_bounds = active & (cur + 8 + csize <= lens)
            is_fmt = in_bounds & (cid == FMT) & (csize >= 16) & (fmt_off < 0)
            fmt_off = np.where(is_fmt, cur + 8, fmt_off)
            is_data = in_bounds & (cid == DATA) & (data_off < 0)
            data_off = np.where(is_data, cur + 8, data_off)
            data_size = np.where(is_data, csize, data_size)
            cursor = np.where(in_bounds,
                              cur + 8 + csize + (csize & 1), lens)

        ok &= (fmt_off >= 0) & (data_off >= 0)
        fb = np.where(ok, fmt_off, 0)
        audio_fmt = buf[base + fb] | (buf[base + fb + 1] << 8)
        channels = buf[base + fb + 2] | (buf[base + fb + 3] << 8)
        rate = (buf[base + fb + 4] | (buf[base + fb + 5] << 8)
                | (buf[base + fb + 6] << 16) | (buf[base + fb + 7] << 24))
        bits = buf[base + fb + 14] | (buf[base + fb + 15] << 8)
        ok &= (audio_fmt == 1) & (bits == 16) & (channels >= 1)

        frame_bytes = np.where(ok, 2 * channels, 1)
        n_frames = np.where(ok, data_size // frame_bytes, 0)
        n_samples = np.where(ok, n_frames * channels, 0)

        # per-sample int16 decode over flat (doc, sample) indices
        total = int(n_samples.sum())
        first_sample = np.zeros(n, dtype=np.int64)
        abs_energy = np.zeros(n, dtype=np.int64)
        if total:
            samp_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(n_samples, out=samp_off[1:])
            rep = np.repeat(np.arange(n), n_samples)
            si = np.arange(total, dtype=np.int64) - samp_off[rep]
            lo_idx = starts[rep] + data_off[rep] + 2 * si
            u = buf[lo_idx] | (buf[lo_idx + 1] << 8)
            s = np.where(u >= 32768, u - 65536, u)
            # reduceat only over docs that own samples (strictly
            # increasing offsets < total) — clamping empty docs' offsets
            # would truncate the preceding doc's segment whenever a
            # valid WAV is followed by an invalid payload in the batch
            nz = n_samples > 0
            abs_energy[nz] = np.add.reduceat(np.abs(s), samp_off[:-1][nz])
            first_sample[nz] = s[samp_off[:-1][nz]]

        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "wav_ok": ok.astype(bool),
            "n_bytes": lens,
            "channels": np.where(ok, channels, 0).astype("int32"),
            "sample_rate": np.where(ok, rate, 0).astype("int32"),
            "bits": np.where(ok, bits, 0).astype("int32"),
            "n_frames": n_frames,
            "first_sample": first_sample,
            "abs_energy": abs_energy,
        })


def _wav_oracle() -> str:
    frames = ("CASE doc_id % 3 WHEN 0 THEN 120 WHEN 1 THEN 200 "
              "ELSE 321 END")
    rate = ("CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 "
            "ELSE 22050 END")
    ch = "CAST(1 + doc_id % 2 AS INT)"
    data_bytes = f"(({frames}) * (1 + doc_id % 2) * 2)"
    # sample k: lo = text byte 2k, hi = text byte 2k+1 (cyclic, UTF-8
    # BYTE domain — r12 content-stress fix: ascii(substring(...)) is
    # char codepoints and diverges on any multi-byte document);
    # int16 = u - 65536 when u >= 32768
    from .multimodal import cyclic_utf8_byte_sql
    lo = cyclic_utf8_byte_sql("2*k")
    hi = cyclic_utf8_byte_sql("2*k+1")
    u16 = f"({lo} + 256 * {hi})"
    sample = (
        "list_transform(generate_series(0, ({n}) - 1), k -> "
        f"CASE WHEN {u16} >= 32768 "
        f"THEN {u16} - 65536 "
        f"ELSE {u16} END)"
    )
    n_samples = f"(({frames}) * (1 + doc_id % 2))"
    return f"""
        SELECT doc_id,
               TRUE AS wav_ok,
               CAST({_WAV_PREFIX} + {data_bytes} AS BIGINT) AS n_bytes,
               {ch} AS channels,
               CAST({rate} AS INT) AS sample_rate,
               16 AS bits,
               CAST({frames} AS BIGINT) AS n_frames,
               CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                    ELSE {sample.format(n=1)}[1] END AS BIGINT)
                   AS first_sample,
               CAST(CASE WHEN octet_length(encode(text)) = 0 THEN 0
                    ELSE list_sum(list_transform({sample.format(n=n_samples)},
                        s -> abs(s))) END AS BIGINT) AS abs_energy
        FROM documents WHERE text IS NOT NULL
    """


@query("q_multimodal_wav_decode", oracle=_wav_oracle(), tags=("multimodal",))
def q_multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-format audio decode: encode each document into a genuine
    RIFF/WAVE PCM file (``wav_encode_batch`` — canonical fmt chunk, a
    padded JUNK chunk, interleaved little-endian int16 samples), then
    parse it back with the dependency-free RIFF decoder
    (``wav_decode_batch`` — magic checks, a real chunk walk honoring the
    odd-size pad rule, int16 PCM decode, exact integer |sample| energy).

    The DuckDB oracle recomputes every column from first principles
    (fixed chunk-layout arithmetic + cyclic two-byte sample sums), so a
    hash match proves the decoder truly walked the format: a wrong data
    offset, skipped pad byte, or byte-order slip shifts the sums. Both
    kernels are vectorized mapInPandas passes — Arrow batches in, numpy
    over a flat byte buffer, no per-row Python (the audio sibling of
    q_multimodal_decode_bmp).
    """

    from .multimodal import binary_docs, fused_round_trip

    return binary_docs(spark, sf_dir).select("doc_id", "payload") \
        .mapInPandas(fused_round_trip(wav_encode_batch, wav_decode_batch),
                     schema=WAV_DECODE_SCHEMA)


# --------------------------------------------------------------------------
# q_dedup_vocab — order-insensitive vocabulary-fingerprint dedup
# --------------------------------------------------------------------------


@query(
    "q_dedup_vocab",
    oracle="""
        WITH t AS (SELECT doc_id,
                          md5(array_to_string(
                              list_sort(list_distinct(string_split(text, ' '))),
                              ' ')) AS fingerprint
                   FROM documents WHERE text IS NOT NULL)
        SELECT fingerprint,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
               array_to_string(list_sort(array_agg(doc_id)), ',') AS member_ids
        FROM t GROUP BY fingerprint HAVING COUNT(*) >= 2
    """,
    tags=("dedup", "text", "north-star"),
)
def q_dedup_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-fingerprint dedup: documents whose DISTINCT term sets
    are identical group together even when term order and repetition
    differ — the canonicalization layer between exact-hash dedup (misses
    reorderings) and MinHash (pays signature cost for what is an exact
    equivalence). Key = md5 of the sorted distinct-term list; md5 and
    lexicographic string sort are engine-identical, so the whole group
    table hash-checks.

    Scale shape: identical to exact dedup — per-row canonicalization is
    a stateless JVM expression chain, then ONE hash-partitioned groupBy
    on the 128-bit fingerprint. member_ids is a bounded per-group list
    serialized to a string (driver canonicalizer contract: no arrays)."""
    # NULL-text docs have no vocabulary fingerprint (r12: concat_ws
    # would silently canonicalize NULL to the EMPTY doc's fingerprint,
    # merging unknown-content docs into the ''-content dup group)
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = d.select(
        "doc_id",
        F.md5(F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split("text", " "))))
        ).alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").alias("canonical_doc_id"),
             F.array_join(F.array_sort(F.collect_list("doc_id")), ",")
             .alias("member_ids"))
        .filter(F.col("n_docs") >= 2)
    )


# --------------------------------------------------------------------------
# q_merge_cdc_delete — MERGE with tombstones (upsert + delete)
# --------------------------------------------------------------------------
# Deterministic delta derived from the snapshot itself so both engines
# replay the identical change set: custkey%10==0 → delete tombstone,
# %10∈{1,2} → update (+100.0 balance), %10==3 → insert under a shifted key.


@query(
    "q_merge_cdc_delete",
    oracle="""
        WITH delta AS (
            SELECT c_custkey AS k, 'D' AS op,
                   NULL AS name, CAST(NULL AS DOUBLE) AS bal
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey, 'U', c_name, c_acctbal + 100.0
            FROM customer WHERE c_custkey % 10 IN (1, 2)
            UNION ALL
            SELECT -(c_custkey + 1), 'I',
                   'NEW #' || CAST(c_custkey AS VARCHAR), 0.0
            FROM customer WHERE c_custkey % 10 = 3
        )
        SELECT COALESCE(d.k, c.c_custkey) AS c_custkey,
               CASE WHEN d.op IS NOT NULL THEN d.name
                    ELSE c.c_name END AS c_name,
               CASE WHEN d.op IS NOT NULL THEN d.bal
                    ELSE c.c_acctbal END AS c_acctbal
        FROM customer c FULL JOIN delta d ON c.c_custkey = d.k
        WHERE COALESCE(d.op, '') <> 'D'
    """,
    tags=("cdc", "merge", "join"),
)
def q_merge_cdc_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE with tombstones — the delete-aware completion of
    q_merge_upsert: one full-outer join applies inserts, updates, AND
    deletes from a change feed onto a snapshot (Delta/Iceberg
    MERGE ... WHEN MATCHED AND op='D' THEN DELETE semantics, expressed
    relationally).

    Scale shape: ONE key-partitioned full-outer join; the delta is
    usually a small fraction of the snapshot, so AQE picks a broadcast
    or skew-split automatically. The +100.0 double update is a single
    identical IEEE op on both engines; no decimal round-trips."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal")
    delta = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_custkey").alias("k"), F.lit("D").alias("op"),
                F.lit(None).cast("string").alias("name"),
                F.lit(None).cast("double").alias("bal"))
        .unionByName(
            c.filter((F.col("c_custkey") % 10).isin(1, 2))
            .select(F.col("c_custkey").alias("k"), F.lit("U").alias("op"),
                    F.col("c_name").alias("name"),
                    (F.col("c_acctbal") + F.lit(100.0)).alias("bal")))
        .unionByName(
            c.filter(F.col("c_custkey") % 10 == 3)
            # NEGATIVE synthetic insert keys: real custkeys are positive
            # at every SF, so inserts can never collide with (and
            # destructively overwrite) an existing customer — the old
            # +10M offset collided at TPC-H SF >= ~67
            .select((-(F.col("c_custkey") + 1)).alias("k"),
                    F.lit("I").alias("op"),
                    F.concat(F.lit("NEW #"),
                             F.col("c_custkey").cast("string")).alias("name"),
                    F.lit(0.0).alias("bal")))
    )
    merged = c.join(delta, c.c_custkey == delta.k, "full_outer")
    return (
        merged.filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("k"), F.col("c_custkey")).alias("c_custkey"),
            F.when(F.col("op").isNotNull(), F.col("name"))
            .otherwise(F.col("c_name")).alias("c_name"),
            F.when(F.col("op").isNotNull(), F.col("bal"))
            .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# q_ts_asof_nearest — bidirectional (nearest-in-time) as-of join
# --------------------------------------------------------------------------


@query(
    "q_ts_asof_nearest",
    oracle="""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
                   FROM events
                   WHERE event_type = 'purchase' AND ts IS NOT NULL),
        c AS (SELECT user_id, epoch_us(ts) AS ct
              FROM events
              WHERE event_type = 'click' AND ts IS NOT NULL),
        j AS (SELECT p.event_id, p.user_id, p.t, c.ct,
                     abs(c.ct - p.t) AS d
              FROM p JOIN c USING (user_id)),
        m AS (SELECT event_id, MIN(d) AS md FROM j GROUP BY event_id)
        SELECT j.event_id, j.user_id,
               CAST(j.t AS BIGINT) AS t_us,
               CAST(MIN(j.ct) AS BIGINT) AS nearest_click_us,
               CAST(MIN(j.ct) - j.t AS BIGINT) AS delta_us
        FROM j JOIN m ON j.event_id = m.event_id AND j.d = m.md
        GROUP BY j.event_id, j.user_id, j.t
    """,
    tags=("timeseries", "join", "events"),
)
def q_ts_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: each purchase attaches the click
    closest in EITHER direction (backward q_join_asof and forward
    q_join_asof_forward pick a side; sensor alignment and attribution
    often want whichever is nearer). Distance ties prefer the earlier
    click, stated as exact BIGINT microsecond arithmetic.

    Scale shape: the union+window formulation — ONE user-keyed sort
    carries both a backward last(click) frame and a forward
    first(click) frame (no time-range join, no fan-out); the oracle is
    the independent join-and-argmin formulation, so the hash certifies
    the window algebra against a different algorithm.

    NULL CONTRACT (r12): nearest-in-time is undefined at a NULL ts —
    null-ts purchases and clicks are excluded on both sides (in the
    window form a null-ts click would sort NULLS-FIRST and become a
    phantom "previous" click; in the oracle its null distance silently
    drops the row instead)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("ts").isNotNull())
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    base = e.select("event_id", "user_id", "event_type", ep.alias("t"))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    click_t = F.when(F.col("event_type") == "click", F.col("t"))
    prev_c = F.last(click_t, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    next_c = F.first(click_t, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing))
    scanned = base.select(
        "event_id", "user_id", "event_type", "t",
        prev_c.alias("prev_c"), next_c.alias("next_c"))
    nearer = F.when(
        F.col("next_c").isNull()
        | (F.col("prev_c").isNotNull()
           & ((F.col("t") - F.col("prev_c"))
              <= (F.col("next_c") - F.col("t")))),
        F.col("prev_c")).otherwise(F.col("next_c"))
    return (
        scanned.filter(F.col("event_type") == "purchase")
        .filter(F.col("prev_c").isNotNull() | F.col("next_c").isNotNull())
        .select(
            "event_id", "user_id", F.col("t").alias("t_us"),
            nearer.alias("nearest_click_us"),
            (nearer - F.col("t")).cast("long").alias("delta_us"),
        )
    )


# --------------------------------------------------------------------------
# q_events_heavy_hitters — exact heavy hitters + Misra-Gries merge contract
# --------------------------------------------------------------------------
# Threshold: a user is a heavy hitter when cnt·1200 > N (> 1/1200 of all
# events — selective at every fixture SF). The MG summary uses k=1280
# counters per partition, so the merged undercount is bounded by
# N/1281 < N/1200 — every exact heavy hitter is GUARANTEED to survive the
# sketch (the classical frequent-items bound), which is what the contract
# columns certify.
_HH_DENOM = 1200
_MG_K = 1280

MG_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("est", LongType()),
    StructField("err", LongType()),
    # out-of-band error-sentinel marker: an in-band user_id=-1 sentinel
    # would merge with (and then silently drop) a REAL user whose id is
    # -1 on signed-hash / sentinel-coded feeds
    StructField("is_err", IntegerType()),
])


def mg_summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries frequent-items summary over user_id:
    exact counts accumulate per Arrow batch; whenever more than k keys
    are live, the (k+1)-th largest count c* is subtracted from every
    counter and non-positive ones drop (each compression removes
    >= (k+1)·c* mass, so the partition error Σc* <= n_p/(k+1)). Emits
    (user_id, est, 0, 0) per surviving key plus one (0, 0, err, 1)
    error-sentinel row (flagged OUT-OF-BAND via is_err, so any real
    user id — negative included — can never collide with it).
    Mergeable: summing ests and errs across partitions preserves
    est <= true and true - est <= Σerr."""
    counts: dict[int, int] = {}
    err = 0
    for pdf in batches:
        for u, c in pdf["user_id"].value_counts().items():
            u = int(u)
            counts[u] = counts.get(u, 0) + int(c)
        if len(counts) > _MG_K:
            vals = sorted(counts.values(), reverse=True)
            c_star = vals[_MG_K]
            counts = {u: c - c_star for u, c in counts.items() if c > c_star}
            err += c_star
    rows = [(u, c, 0, 0) for u, c in counts.items()]
    rows.append((0, 0, err, 1))
    yield pd.DataFrame(rows, columns=["user_id", "est", "err", "is_err"])


@query(
    "q_events_heavy_hitters",
    oracle=f"""
        WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events
                   GROUP BY user_id),
        n AS (SELECT SUM(cnt) AS total FROM c)
        SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
               CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
               TRUE AS mg_found, TRUE AS mg_within_bound
        FROM c CROSS JOIN n
        WHERE cnt * {_HH_DENOM} > total
    """,
    tags=("events", "sketch", "agg"),
)
def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items detection two ways: the exact heavy-hitter table
    (users above 1/1200 of event volume, with exact ppm shares) plus a
    distributed Misra-Gries sketch whose merge is checked against it —
    the mergeable frequent-items rollup that replaces a full groupBy
    when only the heavy tail matters at 100 TB.

    Contract columns (the hll_ok pattern): ``mg_found`` = the heavy
    hitter survived the merged k=1280-counter sketch, ``mg_within_bound``
    = its sketched estimate is <= the true count and within the summed
    per-partition error of it. Both are THEOREMS of the MG bound
    (undercount <= N/(k+1) < the HH threshold) — but only within ONE
    sketch execution, so the merged summary is eagerly checkpointed and
    both the per-key estimates and the global error bound derive from
    that single materialization (re-evaluating the mapInPandas subtree
    twice could pair an est from one run with the err of another). The
    exact values make the whole row hash-checkable while the sketch path
    executes for real (per-partition summaries, one tiny merge shuffle).
    """
    e = load(spark, sf_dir, "events").select("user_id")
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = exact.agg(F.sum("cnt").alias("total"))
    hh = (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * _HH_DENOM > F.col("total"))
        .select("user_id", "cnt",
                # decimal numerator (the power_users int64-wrap guard)
                F.expr("CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000)"
                       " DIV total AS BIGINT)").alias("share_ppm"),
                F.col("total"))
    )
    # ONE sketch execution: the merged summary (<= |users|+partitions
    # rows) is materialized eagerly; est and err_total both read it.
    summaries = (
        e.mapInPandas(mg_summarize, schema=MG_SCHEMA)
        .groupBy("user_id", "is_err")
        .agg(F.sum("est").alias("est"), F.sum("err").alias("err"))
        .localCheckpoint(eager=True)
    )
    merged = summaries.filter(F.col("is_err") == 0).select("user_id", "est")
    err_total = (summaries.filter(F.col("is_err") == 1)
                 .agg(F.sum("err").alias("err_total")))
    return (
        hh.join(merged, "user_id", "left")
        .crossJoin(F.broadcast(err_total))
        .select(
            "user_id", "cnt", "share_ppm",
            (F.coalesce(F.col("est"), F.lit(0)) > 0).alias("mg_found"),
            ((F.coalesce(F.col("est"), F.lit(0)) <= F.col("cnt"))
             & (F.col("cnt") - F.coalesce(F.col("est"), F.lit(0))
                <= F.col("err_total"))).alias("mg_within_bound"),
        )
    )


# --------------------------------------------------------------------------
# q_join_bloom_semi — portable Bloom-filter runtime semi-join
# --------------------------------------------------------------------------
# m = 2^15 bits (one 4 KB bitmap), 3 affine hashes over the md5-derived
# 60-bit base (the llm_dedup portable family): every position is exact
# BIGINT arithmetic in any engine, so the candidate count — including the
# exact number of false positives — is deterministic and DuckDB-checkable.
_BLOOM_M = 1 << 15
_BLOOM_AB = ((920174703, 1133990826), (1299721563, 684312702),
             (470788213, 2063293911))

# Shared portable-hash helpers: the base hash is llm_dedup's md5-derived
# 60-bit family (single source of truth for BOTH engines' expressions);
# affine maps mod P = 2^31-1 then fold into m buckets. Used by the Bloom
# filter and the Count-Min sketch below.
_HASH_P = (1 << 31) - 1


def _h_spark(key_sql: str) -> str:
    from .llm_dedup import _H0_SPARK

    return f"{_H0_SPARK.format(c=f'CAST({key_sql} AS STRING)')} % {_HASH_P}"


def _h_duck(key_sql: str) -> str:
    from .llm_dedup import _H0_DUCK

    return f"{_H0_DUCK.format(c=f'CAST({key_sql} AS VARCHAR)')} % {_HASH_P}"


def _affine_pos(h: str, ab, m: int) -> list[str]:
    """One bucket-position expression per (a, b) pair — identical SQL in
    Spark and DuckDB (pure BIGINT arithmetic, every term < 2^62)."""
    return [f"((({h}) * {a} + {b}) % {_HASH_P}) % {m}" for a, b in ab]
_BLOOM_SEL = 7          # p_partkey % 10 == 7: exactly 10% of keys at any SF


def _bloom_oracle() -> str:
    s_pos = _affine_pos(_h_duck("p_partkey"), _BLOOM_AB, _BLOOM_M)
    l_pos = _affine_pos("lh", _BLOOM_AB, _BLOOM_M)
    return f"""
        WITH s AS (SELECT p_partkey FROM part
                   WHERE p_partkey % 10 = {_BLOOM_SEL}),
        pos AS (SELECT DISTINCT p FROM (
            SELECT {s_pos[0]} AS p FROM s
            UNION ALL SELECT {s_pos[1]} FROM s
            UNION ALL SELECT {s_pos[2]} FROM s)),
        li AS (SELECT l_partkey,
                      {_h_duck("l_partkey")} AS lh
               FROM lineitem),
        flags AS (SELECT l_partkey,
                         ({l_pos[0]}) IN (SELECT p FROM pos)
                         AND ({l_pos[1]}) IN (SELECT p FROM pos)
                         AND ({l_pos[2]}) IN (SELECT p FROM pos)
                             AS bloom_pass,
                         l_partkey IN (SELECT p_partkey FROM s) AS is_exact
                  FROM li)
        SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_keys,
               CAST((SELECT COUNT(*) FROM pos) AS BIGINT) AS bits_set,
               CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_candidates,
               CAST(SUM(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exact,
               CAST(SUM(CASE WHEN bloom_pass AND NOT is_exact
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               TRUE AS no_false_negatives
        FROM flags
    """


@query("q_join_bloom_semi", oracle=_bloom_oracle(),
       tags=("join", "bloom", "scale"))
def q_join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime semi-join audit — THE shuffle-elimination
    pattern at 100 TB: instead of broadcasting (or shuffling) the full
    build-side key set into a fact-table join, broadcast one 4 KB bitmap
    and let the probe side filter map-side; survivors (candidates) are a
    superset of the true matches by construction, verified exactly
    afterwards. The report row carries the full audit: key count, bits
    set, candidate/exact/false-positive counts, and the no-false-
    negatives guarantee.

    DETERMINISM: the bitmap uses the portable md5-affine hash family
    (llm_dedup's), so candidate and false-positive counts are exact
    BIGINT-reproducible in DuckDB — the hash check certifies the actual
    filter, not just its shape.

    Scale shape: the build side collapses to <= 3·|S| distinct bit
    positions (collected once, O(m) driver state — the same contract as
    Spark's native InSubqueryExec/bloom runtime filters); the probe is
    a stateless JVM expression over a 512-long literal array — no join,
    no shuffle on the fact side until the final count aggregation.
    """
    part = load(spark, sf_dir, "part")
    s = part.filter(F.col("p_partkey") % 10 == _BLOOM_SEL) \
        .select("p_partkey")
    # ONE build-side pass (r9 review: the distinct-collect and the
    # count ran as two separate jobs over the same scan); the collected
    # state stays bounded at <= 3·|S| positions, as documented.
    build = s.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(
            F.array(*[F.expr(p) for p in
                      _affine_pos(_h_spark("p_partkey"),
                                  _BLOOM_AB, _BLOOM_M)]))))).alias("pos"),
    ).first()
    positions = [int(p) for p in build["pos"]]
    n_keys = build["n_keys"]
    words = [0] * (_BLOOM_M // 64)
    for p in positions:
        words[p >> 6] |= 1 << (p & 63)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]

    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    tests = [
        f"((element_at(bm, CAST(({p}) DIV 64 AS INT) + 1) "
        f">> (({p}) % 64)) & 1) = 1"
        for p in _affine_pos(_h_spark("l_partkey"), _BLOOM_AB, _BLOOM_M)
    ]
    flags = (
        # one SQL-text parse for the 512-word bitmap (r13 opt: the
        # per-element F.lit loop cost 512 py4j round trips at plan
        # build; F.lit(list) pays the same py4j list conversion)
        li.withColumn(
            "bm",
            F.expr("array(" + ",".join(f"{w}L" for w in words) + ")"))
        .withColumn("bloom_pass", F.expr(" AND ".join(tests)))
        .drop("bm")
        .join(F.broadcast(s.withColumn("is_exact", F.lit(True))),
              F.col("l_partkey") == F.col("p_partkey"), "left")
        .select("bloom_pass",
                F.coalesce(F.col("is_exact"), F.lit(False)).alias("is_exact"))
    )
    return flags.agg(
        F.lit(n_keys).cast("long").alias("n_keys"),
        F.lit(len(positions)).cast("long").alias("bits_set"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).cast("long")
        .alias("n_candidates"),
        F.sum(F.when(F.col("is_exact"), 1).otherwise(0)).cast("long")
        .alias("n_exact"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("is_exact"), 1)
              .otherwise(0)).cast("long").alias("n_false_pos"),
        F.min(F.when(F.col("is_exact"), F.col("bloom_pass"))
              .otherwise(F.lit(True))).alias("no_false_negatives"),
    )


# --------------------------------------------------------------------------
# q_graph_triangles — triangle census over the co-purchase graph
# --------------------------------------------------------------------------
_TRI_MIN_SUPPORT = 2


@query(
    "q_graph_triangles",
    oracle=f"""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
              FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING COUNT(*) >= {_TRI_MIN_SUPPORT}),
        deg AS (SELECT node, COUNT(*) AS d FROM (
                    SELECT a AS node FROM e
                    UNION ALL SELECT b FROM e) GROUP BY node),
        tri AS (SELECT COUNT(*) AS n FROM e e1
                JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
               CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
               CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT)
                   AS n_wedges,
               CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
               CASE WHEN (SELECT SUM(d * (d - 1) / 2) FROM deg) > 0
                    THEN round(3.0 * (SELECT n FROM tri)
                               / (SELECT SUM(d * (d - 1) / 2) FROM deg), 6)
                    ELSE NULL END AS transitivity
    """,
    tags=("graph", "join", "analytics"),
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the co-purchase graph (parts co-occurring in
    >= 2 orders): edge/wedge/triangle counts and global transitivity —
    the third graph-algorithm shape next to connected components (BSP
    fixpoint) and PageRank (power iteration): a bounded-depth JOIN
    pyramid.

    Triangles are counted once each via the ordered wedge join
    (a < b < c: edges are stored lowest-id-first, wedges join
    e1(a,b)⋈e2(b,c), closed by e3(a,c)) — the standard distributed
    triangle algorithm; cost ∝ Σ deg(b)² over wedge middles, bounded
    here by the min-support edge filter. Edges come from the single-
    shuffle co-occurrence fan-out (api.cooccurrence_pairs: basket
    collect_set + codegen pair expansion — no self-join); min-support
    both shrinks the graph and de-skews the wedge join (hub parts
    appear in many orders, but their edge lists collapse first).

    Scale shape: two shuffles (edge build, wedge join); the closing
    check is a semi-join shape on (a, c). At billion-edge scale the
    wedge join keys on b — the degree-ordered orientation used here is
    exactly the standard skew mitigation.
    """
    from ..api import cooccurrence_pairs

    li = load(spark, sf_dir, "lineitem")
    e = (
        cooccurrence_pairs(li, "l_orderkey", "l_partkey",
                           min_support=_TRI_MIN_SUPPORT)
        .select(F.col("item_a").alias("ea"), F.col("item_b").alias("eb"))
        # three consumers (degree table, wedge join both sides, closing
        # semi-join) — materialize the bounded edge list once
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("ea").alias("node"))
        .unionByName(e.select(F.col("eb").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    # r13 opt: node count and wedge sum in ONE aggregate over deg —
    # as separate frames each broadcast job rebuilt the degree table
    # from the edge list (two identical groupBy passes per run).
    node_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.eb") == F.col("e2.ea"))
        .join(e3, (F.col("e3.ea") == F.col("e1.ea"))
              & (F.col("e3.eb") == F.col("e2.eb")), "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    edges_n = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        node_wedges.crossJoin(F.broadcast(edges_n))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_wedges", "n_triangles",
            # zero-wedge guard: Spark yields NULL on 0/0 but DuckDB
            # yields NaN — state the degenerate case explicitly
            F.when(F.col("n_wedges") > 0,
                   F.round(F.lit(3.0) * F.col("n_triangles")
                           / F.col("n_wedges"), 6)).alias("transitivity"),
        )
    )


# --------------------------------------------------------------------------
# q_agg_countmin — Count-Min sketch with an EXACT oracle
# --------------------------------------------------------------------------
# d=3 rows × w=2048 counters, md5-affine row hashes. Because the merged
# counter matrix is a pure aggregate of the data (cell[j][p] = Σ counts of
# keys hashing to p under h_j), the sketch is partition-independent and
# the DuckDB oracle rebuilds the IDENTICAL matrix in SQL — the estimates
# themselves hash-check, not just a bound (stronger than the MG/HLL
# contract pattern).
_CM_W = 2048
_CM_AB = ((1203071381, 946579823), (1528960981, 360922847),
          (812176523, 1720754035))


def _cm_oracle() -> str:
    pos = _affine_pos(_h_duck("user_id"), _CM_AB, _CM_W)
    rows = " UNION ALL ".join(
        f"SELECT user_id, cnt, {j} AS j, {p} AS pos FROM c"
        for j, p in enumerate(pos))
    return f"""
        WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events
                   GROUP BY user_id),
        keyed AS ({rows}),
        cm AS (SELECT j, pos, SUM(cnt) AS cell FROM keyed GROUP BY j, pos)
        SELECT k.user_id, CAST(MIN(k.cnt) AS BIGINT) AS cnt,
               CAST(MIN(cm.cell) AS BIGINT) AS cm_est,
               CAST(MIN(cm.cell) - MIN(k.cnt) AS BIGINT) AS overcount
        FROM keyed k JOIN cm ON k.j = cm.j AND k.pos = cm.pos
        GROUP BY k.user_id
    """


@query("q_agg_countmin", oracle=_cm_oracle(), tags=("agg", "sketch"))
def q_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point queries over user event counts — the OVERcount
    twin of the Misra-Gries undercount sketch (q_events_heavy_hitters):
    est(u) = min over d=3 rows of the 2048-cell counter the key hashes
    into, always >= the true count, with collisions adding exactly the
    colliding keys' mass.

    Because the merged counter matrix is itself an aggregate (cell =
    sum of counts hashing there), the sketch is partitioning-
    independent and the oracle rebuilds the identical matrix with the
    portable md5-affine hashes — estimates AND overcounts hash-check
    exactly.

    Scale shape: ONE user-keyed count (the same partial-agged groupBy a
    plain count needs), then a 3-row fan-out into a <= d·w cell table
    that BROADCASTs back for the min — the fact table never shuffles
    twice. At 100 TB the counter build rides map-side partial
    aggregation into 6144 cells; the whole sketch is one small
    broadcast regardless of key cardinality.
    """
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    pos = _affine_pos(_h_spark("user_id"), _CM_AB, _CM_W)
    keyed = c.select(
        "user_id", "cnt",
        F.posexplode(F.array(*[F.expr(p) for p in pos])).alias("j", "pos"),
    )
    cm = keyed.groupBy("j", "pos").agg(F.sum("cnt").alias("cell"))
    return (
        keyed.join(F.broadcast(cm), ["j", "pos"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cnt"),
             F.min("cell").alias("cm_est"),
             (F.min("cell") - F.min("cnt")).alias("overcount"))
    )


# --------------------------------------------------------------------------
# q_join_grid_knn — k-nearest-neighbor join over the spatial grid
# --------------------------------------------------------------------------
_KNN_K = 3


@query(
    "q_join_grid_knn",
    oracle=f"""
        -- mod-first products (r9 review: the direct key*KNUTH product
        -- is the int64-overflow form relational.py hardened away —
        -- identical values at every scale since (a*b) mod m ==
        -- ((a mod m)(b mod m)) mod m, but never overflows)
        WITH pts AS (SELECT o_orderkey AS id,
                            ((o_orderkey % 10000) * {2654435761 % 10000})
                                % 10000 AS x,
                            ((o_custkey % 10000) * {1540483477 % 10000})
                                % 10000 AS y
                     FROM orders),
        pairs AS (SELECT a.id AS id, b.id AS nbr,
                         GREATEST(abs(a.x - b.x), abs(a.y - b.y)) AS d
                  FROM pts a JOIN pts b
                    ON a.id <> b.id
                   AND abs(a.x - b.x) <= 5 AND abs(a.y - b.y) <= 5),
        ranked AS (SELECT id, nbr, CAST(d AS BIGINT) AS cheb_dist,
                          ROW_NUMBER() OVER (
                              PARTITION BY id ORDER BY d, nbr) AS rnk
                   FROM pairs)
        SELECT id, nbr, cheb_dist, CAST(rnk AS INT) AS rnk
        FROM ranked WHERE rnk <= {_KNN_K}
    """,
    tags=("join", "spatial", "topk"),
)
def q_join_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor join (k=3, radius-bounded): each point's three
    closest neighbors within Chebyshev radius 5, fully tie-broken —
    the kNN companion of q_join_grid_neighbors' pair enumeration (ANN
    blocking, spatial features, dedup candidate ranking).

    Built on the SAME half-neighborhood grid pairs, symmetrized (each
    unordered pair serves both endpoints), then ONE per-point window
    rank. The oracle is the brute-force range self-join + rank — an
    independent algorithm, so the hash certifies grid coverage AND the
    tie-broken cut.

    Scale shape: the grid join bounds candidates by Σ|cell|²; the rank
    window shuffles only the radius-bounded pair list, and a per-point
    candidate cap is the documented skew guard at billion-point scale.
    """
    from .relational import q_join_grid_neighbors

    # materialize the radius-bounded pair list ONCE: both union branches
    # consume the grid-join subtree, and Spark re-executes the whole
    # scan + 5x explode + shuffle join per branch otherwise (only leaf
    # exchanges dedupe via ReusedExchange) — the q_graph_triangles
    # convention (r8 review)
    pairs = q_join_grid_neighbors(spark, sf_dir).localCheckpoint(eager=True)
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr"), "cheb_dist"
    ).unionByName(pairs.select(
        F.col("id_b").alias("id"), F.col("id_a").alias("nbr"), "cheb_dist"
    ))
    w = Window.partitionBy("id").orderBy("cheb_dist", "nbr")
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _KNN_K)
    )


# --------------------------------------------------------------------------
# q_ts_seasonal — hour-of-day seasonal profile + residuals
# --------------------------------------------------------------------------


@query(
    "q_ts_seasonal",
    oracle="""
        WITH ev AS (SELECT * FROM events
                    -- measure domain (r13): a NaN/inf/huge value is
                    -- not a measurement; it has no residual and joins
                    -- no profile — costs its own row on BOTH sides
                    WHERE abs(value) < 9.0e11),
        s AS (SELECT event_type, EXTRACT(hour FROM ts) AS hod,
                          SUM(CAST(round(value * 100) AS BIGINT)) AS svc,
                          COUNT(*) AS cv
                   FROM ev GROUP BY 1, 2),
        -- integer half-up mean in micro-units (the r12 rounding-tie
        -- rule): svc/(100·cv) is a finite-decimal rational, and the
        -- temporal proxy manufactured a cv=96 bucket whose 7th decimal
        -- digit is exactly 5 — Spark HALF_UP and DuckDB then disagree
        -- at 6dp. Integer division has no tie; ONE /1e6 at the end.
        m AS (SELECT event_type, hod,
                     (2 * svc * 10000 + cv) // (2 * cv) AS mean_e6
              FROM s)
        SELECT e.event_id, e.event_type,
               CAST(EXTRACT(hour FROM e.ts) AS INT) AS hod,
               e.value,
               CAST(mean_e6 AS DOUBLE) / 1000000.0 AS seasonal,
               CAST(CAST(round(e.value * 100) AS BIGINT) * 10000 - mean_e6
                    AS DOUBLE) / 1000000.0 AS residual
        FROM ev e
        JOIN m ON m.event_type = e.event_type
              AND m.hod = EXTRACT(hour FROM e.ts)
    """,
    tags=("timeseries", "stats"),
)
def q_ts_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive decomposition: the per-(type, hour-of-day) mean
    profile and each event's residual against it — the detrending step
    in front of any anomaly rule (q_events_anomaly_zscore flags raw
    volumes; this separates time-of-day signal from noise on values).

    DETERMINISM: values carry 2 decimal places (non-negative), so the
    profile sums EXACT BIGINT cents (a double Σvalue would depend on
    partition sum order); the mean is integer HALF-UP in micro-units
    ((2·svc·10⁴ + cv) DIV (2·cv) — exact.hourly_cents_mean_e6's rule:
    the double form round(svc/(100·cv), 6) TIES when cv is a power of
    two, caught by the r12 temporal proxy at cv=96), and the residual
    is an exact integer subtraction cents·10⁴ − mean_e6; ONE /1e6 per
    output column.

    Scale shape: the 24×|types| profile is a partial-agged groupBy that
    BROADCASTs back; the fact table never shuffles.
    """
    # measure domain (r13) — see the oracle's ev CTE
    e = load(spark, sf_dir, "events").filter(measure_domain("value"))
    prof = (
        e.groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("svc"),
             F.count(F.lit(1)).alias("cv"))
        .select("event_type", "hod",
                F.expr("(2 * svc * 10000 + cv) DIV (2 * cv)")
                .cast("long").alias("mean_e6"))
    )
    return (
        e.select("event_id", "event_type", F.hour("ts").alias("hod"),
                 "value")
        .join(F.broadcast(prof), ["event_type", "hod"])
        .select(
            "event_id", "event_type",
            F.col("hod").cast("int").alias("hod"), "value",
            (F.col("mean_e6").cast("double") / 1e6).alias("seasonal"),
            ((F.round(F.col("value") * 100).cast("long") * 10000
              - F.col("mean_e6")).cast("double") / 1e6).alias("residual"),
        )
    )


# --------------------------------------------------------------------------
# q_events_session_stats — per-user session rollup
# --------------------------------------------------------------------------
_SESS_GAP_US = 3_600_000_000


@query(
    "q_events_session_stats",
    oracle=f"""
        WITH o AS (SELECT user_id, epoch_us(ts) AS t,
                          LAG(epoch_us(ts)) OVER (
                              PARTITION BY user_id ORDER BY ts) AS prev
                   FROM events
                   WHERE ts IS NOT NULL),
        marked AS (SELECT user_id, t,
                          CASE WHEN prev IS NOT NULL
                                    AND t - prev > {_SESS_GAP_US}
                               THEN 1 ELSE 0 END AS is_start
                   FROM o),
        sess AS (SELECT user_id, t,
                        SUM(is_start) OVER (
                            PARTITION BY user_id ORDER BY t
                            RANGE BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS sid
                 FROM marked),
        per AS (SELECT user_id, sid, COUNT(*) AS n_events,
                       MAX(t) - MIN(t) AS dur_us
                FROM sess GROUP BY user_id, sid)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(dur_us) AS BIGINT) AS total_duration_us,
               round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
                   AS avg_session_events
        FROM per GROUP BY user_id
    """,
    tags=("events", "sessionization"),
)
def q_events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session rollup over 1-hour-gap sessions: session count,
    events, total in-session dwell time, mean session size — the
    engagement report built directly ON q_win_session_batch's session
    table (the gaps-and-islands primitive is defined exactly once; its
    RANGE-frame cumsum also makes timestamp ties deterministic — tied
    rows are frame peers and always land in the same session).

    Timestamps are exact BIGINT microseconds throughout; the only float
    is one final mean division rounded 6dp.

    Scale shape: q_win_session_batch plans ONE user-keyed sort shared
    by both its windows; this adds two partial-agged rollups on the
    same user partitioning. No joins.

    NULL CONTRACT (r12): inherits q_win_session_batch's rule — null-ts
    events are not sessionizable and are excluded; the oracle's own
    session CTE states the same filter.
    """
    from .advanced import q_win_session_batch

    s = q_win_session_batch(spark, sf_dir)
    dur = (F.unix_micros(F.col("session_end").cast("timestamp"))
           - F.unix_micros(F.col("session_start").cast("timestamp")))
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum(dur).alias("total_duration_us"),
        F.round(F.sum("n_events").cast("double") / F.count(F.lit(1)), 6)
        .alias("avg_session_events"),
    )


# --------------------------------------------------------------------------
# q_dedup_incremental — new-batch dedup against the historical index
# --------------------------------------------------------------------------
# Deterministic ingest split: doc_id % 5 == 4 plays the "today's crawl"
# batch; the rest is the historical corpus whose fingerprint index the new
# batch checks against — the daily-ingest shape where dedup must NOT
# rescan history, only probe its index.


@query(
    "q_dedup_incremental",
    oracle="""
        WITH hist AS (SELECT md5(text) AS fp, MIN(doc_id) AS canonical
                      FROM documents WHERE doc_id % 5 <> 4 GROUP BY fp),
        new AS (SELECT doc_id, md5(text) AS fp
                FROM documents WHERE doc_id % 5 = 4)
        SELECT new.doc_id,
               hist.fp IS NOT NULL AS dup_of_history,
               CAST(hist.canonical AS BIGINT) AS canonical_doc_id
        FROM new LEFT JOIN hist ON new.fp = hist.fp
    """,
    tags=("dedup", "cdc", "north-star"),
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: each document in the new batch probes
    the HISTORICAL fingerprint index (content hash → canonical doc) and
    reports whether it duplicates history and whom — the daily-crawl
    shape where the O(history) work happened once at index-build time
    and each ingest pays only O(batch).

    Scale shape: the history side collapses to its fingerprint index
    via one partial-agged groupBy (in production this table is
    maintained incrementally, not rebuilt); the probe is a left join
    the new batch drives. AQE broadcasts whichever side is small; at
    100 TB history the index is hash-bucketed and the probe co-locates
    on fp (or pre-filters through q_join_bloom_semi's bitmap — the
    composition these two queries document).
    """
    d = load(spark, sf_dir, "documents")
    hist = (
        d.filter(F.col("doc_id") % 5 != 4)
        .select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp").agg(F.min("doc_id").alias("canonical"))
    )
    new = (
        d.filter(F.col("doc_id") % 5 == 4)
        .select("doc_id", F.md5("text").alias("fp"))
    )
    return (
        new.join(hist, "fp", "left")
        .select(
            "doc_id",
            F.col("canonical").isNotNull().alias("dup_of_history"),
            F.col("canonical").alias("canonical_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# q_events_attribution — linear multi-touch attribution
# --------------------------------------------------------------------------
_ATTR_WINDOW_US = 3_600_000_000


@query(
    "q_events_attribution",
    oracle=f"""
        WITH c AS (SELECT event_id AS click_id, user_id,
                          epoch_us(ts) AS ct
                   FROM events WHERE event_type = 'click'),
        p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pt,
                     value
              FROM events WHERE event_type = 'purchase'),
        pairs AS (SELECT c.click_id, c.user_id, p.purchase_id, p.value,
                         COUNT(*) OVER (PARTITION BY p.purchase_id)
                             AS n_touch
                  FROM c JOIN p ON c.user_id = p.user_id
                     AND p.pt - c.ct BETWEEN 0 AND {_ATTR_WINDOW_US})
        SELECT click_id, user_id,
               CAST(COUNT(*) AS BIGINT) AS n_attributions,
               -- + 0.0 (r13 numeric sweep): Spark's aggregate seeds
               -- the fold with 0.0, DuckDB's list_reduce with the
               -- FIRST element — a -0.0 share surfaces the asymmetry
               round(list_reduce(
                   array_agg(value / n_touch ORDER BY purchase_id),
                   (x, y) -> x + y), 6) + 0.0 AS credit
        FROM pairs GROUP BY click_id, user_id
    """,
    tags=("events", "join", "analytics"),
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value splits
    equally across the user's clicks in the hour before it, and each
    click reports its total earned credit — the ad-tech revenue
    assignment built from an interval join plus a per-purchase touch
    count.

    DETERMINISM: value/n_touch is one identical division; each click's
    credits then sum in EXPLICIT purchase_id order via the ordered fold
    (``aggregate`` HOF ≡ ``list_reduce`` — the q_ts_ewma technique), so
    the float chain is engine-identical.

    Scale shape: the pair join is user-keyed with the time residual
    inside the join (per-user click×purchase products — bounded by
    per-user activity; at planetary scale block on (user, hour-bucket)
    exactly as q_join_grid_neighbors blocks its plane). The touch count
    rides a purchase-keyed window on the already-joined pairs.
    """
    e = load(spark, sf_dir, "events")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", ep.alias("ct"))
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"), ep.alias("pt"), "value")
    pairs = c.join(
        p, (F.col("user_id") == F.col("p_user"))
        & ((F.col("pt") - F.col("ct")).between(0, _ATTR_WINDOW_US)))
    n_touch = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    shared = pairs.select(
        "click_id", "user_id", "purchase_id",
        (F.col("value") / n_touch).alias("share"),
    )
    return shared.groupBy("click_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_attributions"),
        (F.round(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("purchase_id",
                                                     "share"))),
                F.lit(0.0), lambda acc, x: acc + x["share"]),
            6) + F.lit(0.0)).alias("credit"),
    )


# --------------------------------------------------------------------------
# q_ts_backlog — event-sourced daily open-item balance
# --------------------------------------------------------------------------


@query(
    "q_ts_backlog",
    oracle="""
        WITH li AS (SELECT l_orderkey, l_shipdate FROM lineitem),
        deltas AS (
            SELECT time_bucket(INTERVAL 1 DAY, o.o_orderdate) AS day,
                   CAST(1 AS BIGINT) AS ordered, CAST(0 AS BIGINT) AS shipped
            FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
            UNION ALL
            SELECT time_bucket(INTERVAL 1 DAY, l_shipdate), 0, 1 FROM li),
        daily AS (SELECT day, SUM(ordered) AS n_ordered,
                         SUM(shipped) AS n_shipped
                  FROM deltas GROUP BY day)
        SELECT day,
               CAST(n_ordered AS BIGINT) AS n_ordered,
               CAST(n_shipped AS BIGINT) AS n_shipped,
               CAST(SUM(n_ordered - n_shipped) OVER (
                        ORDER BY day NULLS FIRST
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS open_backlog
        FROM daily
    """,
    tags=("timeseries", "events", "window"),
)
def q_ts_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourced daily fulfillment balance: +1 when an order line is
    placed (its order's date), −1 when it ships, cumulated into the
    open-unshipped backlog per day — the running-balance shape behind
    inventory, queue-depth, and account-ledger reports.

    Scale shape: the ±1 deltas partial-aggregate into one row per
    (day, direction) BEFORE any shuffle (the orderkey join is the only
    fact-sized exchange), so the running-sum window sorts only the
    bounded day table (~2,500 rows at any corpus size — a deliberate
    single-partition window over a provably tiny input; the day-RANGE
    repartition is the swap if the key domain were unbounded).

    NULL ORDERING (r12, pinned): the NULL day group — deltas whose
    order/ship date is unknown — folds FIRST, as the ledger's opening
    balance (NULLS FIRST on both sides: Spark's asc default, explicit
    in the oracle where DuckDB defaults NULLS LAST and would hand the
    unknown-date deltas the CLOSING balance instead).
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    placed = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.date_trunc("day", "o_orderdate").alias("day"),
                F.lit(1).cast("long").alias("ordered"),
                F.lit(0).cast("long").alias("shipped"))
    )
    deltas = placed.unionByName(li.select(
        F.date_trunc("day", "l_shipdate").alias("day"),
        F.lit(0).cast("long").alias("ordered"),
        F.lit(1).cast("long").alias("shipped"),
    ))
    daily = deltas.groupBy("day").agg(
        F.sum("ordered").alias("n_ordered"),
        F.sum("shipped").alias("n_shipped"),
    )
    w = (Window.orderBy(F.col("day").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, 0))
    return daily.select(
        "day", "n_ordered", "n_shipped",
        F.sum(F.col("n_ordered") - F.col("n_shipped")).over(w)
        .alias("open_backlog"),
    )
