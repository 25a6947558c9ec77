"""Content-distribution stress proxy (r12): the FIFTH adversarial
value-parity axis — degenerate TEXT and degenerate EMBEDDINGS.

The NULL axis (tools/null_stress.py) deliberately left
``documents.text`` and ``embeddings.embedding`` untouched because the
text/ANN kernels "carry their own validity-filter contract" — but that
contract had never been adversarially swept. This tool rewrites a
deterministic slice of those two columns with the content classes a
real 100 TB lake WILL contain and the synthetic fixtures never do:

documents.text (one class per stressed row; ``n_chars`` recomputed so
the lake's own consistency invariant holds):

  0  empty string        "" is NOT NULL — a different row class than
                         the NULL axis; split('', ' ') = [''] on both
                         engines, but every downstream ratio/shingle
                         kernel sees a 1-token empty-term doc.
  1  whitespace-only     space runs, tabs, newlines → all-empty token
                         lists; stresses ws-token counting + quality.
  2  sub-shingle         a doc shorter than every shingle width in the
                         dedup family (MinHash k-shingles, bigrams).
  3  CJK                 multi-byte chars; length() is codepoints on
                         both engines but any byte-based path diverges.
  4  astral vs BMP-high  emoji (U+1F68x, astral) mixed with U+E000/
                         U+F8FF (BMP private-use): Spark compares
                         strings by UTF-16 CODE UNITS (surrogates
                         0xD800-DFFF < 0xE000), DuckDB by UTF-8 BYTES
                         (4-byte astral > 3-byte U+E000) — the two
                         engines DISAGREE on the relative order of
                         these rows in any min/max/sort/top-k over
                         text. The string analogue of the NULLS
                         FIRST/LAST catch the r12 null axis was built
                         around.
  5  case/fold stress    ß (upper → 'SS', 1→2 chars), dotted İ,
                         ligature ﬁ, combining diacritics — upper/
                         lower/length interactions where Java and
                         utf8proc case tables could differ.
  6  single-token spam   one token repeated ~120× (plus a trailing
                         space → trailing empty token): repetition /
                         vocab-dominance / top-term kernels.
  7  megadoc             ~20k chars of deterministic pseudo-words:
                         chunking boundaries, token budgets, seqlen
                         bucketing at the far tail.
  8  punctuation-only    no alphanumerics at all: langid, quality and
                         BPE-regex tokenizers get zero word matches.
  9  ragged whitespace   tabs + doubled spaces: split(' ') emits empty
                         tokens mid-list and tab-glued "tokens".
  10 NULL text           (with n_chars → NULL, the lake's unknown-size
                         contract): encode(NULL) is a NULL payload —
                         found crashing _flat_batch (len(None)) in
                         EVERY multimodal kernel before the sweep even
                         ran; the fix contract is "no text → no
                         payload → costs its own row" stated as a
                         filter in binary_docs and WHERE text IS NOT
                         NULL in every codec oracle.

embeddings.embedding (classes a validity filter must catch or the
kernels must survive):

  0  zero vector         cosine 0/0 — the family's documented 0.0
                         guard, now actually exercised by the lake.
  1  NaN component       the _valid_emb contract class.
  2  +inf component      inf passes a null/NaN check but inf·0 → NaN
                         in dot products; finiteness is the gap this
                         axis was designed to expose.
  3  -inf component      sign symmetry of class 2.
  4  wrong dimension     truncated vector (majority_dim - 5).
  5  NULL embedding      whole-list null.
  6  NULL element        list with a null slot (Arrow → NaN on read).
  7  exact duplicate     copy of another row's vector → perfect cosine
                         ties; top-k must tie-break deterministically
                         on vec_id on BOTH engines or hash parity dies.
  8  NULL label          the vector is pristine but its cluster/block
                         key is unknown: label-blocked joins must drop
                         the row (NULL never equi-joins), label
                         group-bys must carry a NULL group, on BOTH
                         engines.

Masks/classes are DETERMINISTIC (same Knuth-multiplicative hash as
null_stress) so re-runs triage identical rows; the manifest guard
makes rebuilds idempotent. Both engines read the SAME stressed
parquet, so every mismatch is a genuine semantics divergence, never
noise.

``--rate-scale`` multiplies the per-class rate (default 10 permille
per text class, 8 per embedding class); the total stressed fraction is
capped at 50 % of rows, matching the null axis's degenerate ceiling.

Reference anchor: the reference's malformed-data channel is the typed
JSON decode failure (TestMsgJsonSerde.scala:17-22) — a malformed
record costs its own row, never the stream. Degenerate text/vectors
are that contract's batch-content analogue (SURVEY §1.1 row 7).

Run:    python -m zio_kinesis_example_spark.tools.content_stress \
            [--src /root/testdata/sf0.01] [--out /tmp/contentstress_sf001] \
            [--queries name,name] [--build-only] [--rate-scale N]
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"

_KNUTH = np.uint64(2654435761)

#: untouched tables — the relational axis is null_stress's job.
FIXED = ("region", "nation", "customer", "supplier", "part",
         "orders", "lineitem", "events")

TEXT_CLASSES = 11
EMB_CLASSES = 9
TEXT_PERMILLE = 10   # per class, scale 1 → 10 % of docs stressed
EMB_PERMILLE = 8     # per class, scale 1 → 6.4 % of vectors stressed


def _bucket(n: int, table: str) -> np.ndarray:
    """Deterministic per-row bucket in [0, 1000) — same recipe as
    null_stress._mask so the two proxies stress disjoint hash streams
    only by their differing (table, column) seeds."""
    seed = np.uint64(zlib.crc32(f"{table}.content".encode()))
    idx = np.arange(n, dtype=np.uint64)
    h = (idx + np.uint64(1)) * _KNUTH + seed * np.uint64(0x9E3779B9)
    h ^= h >> np.uint64(16)
    h *= _KNUTH
    h ^= h >> np.uint64(13)
    return (h % np.uint64(1000)).astype(np.int64)


def _megadoc(i: int) -> str:
    """~20k chars of deterministic pseudo-words seeded by row index."""
    words = []
    x = (i * 2654435761 + 12345) & 0xFFFFFFFF
    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    while sum(len(w) + 1 for w in words) < 20000:
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        words.append(vocab[x % len(vocab)])
    return " ".join(words)


def _stress_text(i: int, cls: int) -> str:
    if cls == 0:
        return ""
    if cls == 1:
        return "   \t \n  "
    if cls == 2:
        return "hi"
    if cls == 3:
        return "数据 处理 引擎 スパーク 分析 データ 引擎 数据"
    if cls == 4:
        return "\U0001F680 rocket  private \U0001F525 fire  area"
    if cls == 5:
        return "Café NAÏVE Straße ﬁnesse İstanbul strànge"
    if cls == 6:
        return ("spam " * 120)
    if cls == 7:
        return _megadoc(i)
    if cls == 8:
        return "!!! ??? ... ;; :: -- ## ***"
    if cls == 9:
        return "tab\tglued\ttokens and  doubled  spaces trailing "
    return None    # cls 10: NULL text (n_chars goes NULL with it)


def _stress_emb(vec, i: int, cls: int, dim: int, pool):
    v = np.asarray(vec, dtype=np.float32).copy()
    if cls == 0:
        return np.zeros(dim, dtype=np.float32)
    if cls == 1:
        v[i % dim] = np.float32("nan")
        return v
    if cls == 2:
        v[i % dim] = np.float32("inf")
        return v
    if cls == 3:
        v[i % dim] = np.float32("-inf")
        return v
    if cls == 4:
        return v[: max(1, dim - 5)]
    if cls == 5:
        return None
    if cls == 6:
        out = v.astype(object)
        out[i % dim] = None
        return out
    if cls == 7:
        # exact duplicate of a deterministic other row's ORIGINAL
        # vector (pool = pristine vectors) → perfect cosine ties.
        return np.asarray(pool[(i * 7 + 3) % len(pool)], dtype=np.float32)
    return v       # cls 8: vector pristine, LABEL nulled by caller


def build_content_proxy(out_dir: str, src: str = SRC,
                        rate_scale: int = 1) -> str:
    text_pm = TEXT_PERMILLE * rate_scale
    emb_pm = EMB_PERMILLE * rate_scale
    # cap the TOTAL stressed fraction at 50 % (null-axis ceiling)
    text_pm = min(text_pm, 500 // TEXT_CLASSES)
    emb_pm = min(emb_pm, 500 // EMB_CLASSES)

    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"src": src, "text_pm": text_pm, "emb_pm": emb_pm,
            "fixed": list(FIXED), "v": 2}
    try:
        with open(manifest) as fh:
            if json.load(fh) == want:
                return out_dir
    except (OSError, ValueError):
        pass

    for name in FIXED:
        shutil.copyfile(os.path.join(src, f"{name}.parquet"),
                        os.path.join(out_dir, f"{name}.parquet"))

    # --- documents ---------------------------------------------------
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    n = t.num_rows
    b = _bucket(n, "documents")
    cls = b // text_pm          # class id where stressed
    stressed = b < text_pm * TEXT_CLASSES
    text = t.column("text").to_pylist()
    nchars = t.column("n_chars").to_pylist()
    for i in np.flatnonzero(stressed):
        s = _stress_text(int(i), int(cls[i]))
        text[i] = s
        # preserve the lake's n_chars invariant (NULL text → NULL size)
        nchars[i] = None if s is None else len(s)
    cols, fields = [], []
    for field in t.schema:
        if field.name == "text":
            cols.append(pa.array(text, type=pa.string()))
        elif field.name == "n_chars":
            cols.append(pa.array(nchars, type=pa.int64()))
        else:
            cols.append(t.column(field.name).combine_chunks())
        fields.append(field)
    pq.write_table(pa.Table.from_arrays(cols, schema=pa.schema(fields)),
                   os.path.join(out_dir, "documents.parquet"))

    # --- embeddings --------------------------------------------------
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    n = t.num_rows
    b = _bucket(n, "embeddings")
    cls = b // emb_pm
    stressed = b < emb_pm * EMB_CLASSES
    pool = t.column("embedding").to_pylist()      # pristine originals
    dim = len(pool[0])
    emb = list(pool)
    label = t.column("label").to_pylist()
    for i in np.flatnonzero(stressed):
        v = _stress_emb(pool[i], int(i), int(cls[i]), dim, pool)
        emb[i] = None if v is None else list(v)
        if cls[i] == 8:
            label[i] = None     # pristine vector, unknown cluster key
    cols, fields = [], []
    for field in t.schema:
        if field.name == "embedding":
            cols.append(pa.array(emb, type=field.type))
        elif field.name == "label":
            cols.append(pa.array(label, type=field.type))
        else:
            cols.append(t.column(field.name).combine_chunks())
        fields.append(field)
    pq.write_table(pa.Table.from_arrays(cols, schema=pa.schema(fields)),
                   os.path.join(out_dir, "embeddings.parquet"))

    tmp = f"{manifest}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(want, fh)
    os.replace(tmp, manifest)          # written LAST: a killed build
    return out_dir                     # re-reads as a mismatch


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset; default = full registry")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--rate-scale", type=int, default=1,
                    help="multiply per-class rates (total capped at 50%%)")
    args = ap.parse_args()
    out = args.out or ("/tmp/contentstress_" + os.path.basename(
        args.src.rstrip("/")).replace(".", "")
        + (f"_x{args.rate_scale}" if args.rate_scale != 1 else ""))
    build_content_proxy(out, src=args.src, rate_scale=args.rate_scale)
    print(f"proxy ready: {out}", flush=True)
    if args.build_only:
        return

    from ..session import get_spark
    from .oracle import compare_all

    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries.split(",") if args.queries else None
    res = compare_all(spark, out, names=names)
    bad = [r for r in res if not r.ok]
    for r in res:
        print(("OK  " if r.ok else "FAIL") + f" {r.name}"
              + ("" if r.ok else f"  {r.detail[:300]}"), flush=True)
    print(f"checked {len(res)}, failures {len(bad)}")
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
