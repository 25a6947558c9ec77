"""Property-based tests (hypothesis): operator semantics checked against
independent pure-Python models on randomized inputs — the test layer the
reference lacks entirely (SURVEY.md §5 'Not present: property-based').

Strategy: generate small random event sets, run the REGISTERED operator
implementation over a parquet temp table, and compare to a ~10-line
Python model of the semantics. Catches boundary bugs (gap exactly at
threshold, equal timestamps, empty partitions) that fixed testdata never
hits.
"""

from __future__ import annotations

import os

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F
from pyspark.sql.window import Window

GAP_US = 3_600_000_000


def _sessionize_model(rows):
    """Pure-Python gaps-and-islands with 1h gap: {(user, session_id): n}."""
    out = {}
    by_user = {}
    for user, ts_us in rows:
        by_user.setdefault(user, []).append(ts_us)
    for user, tss in by_user.items():
        tss.sort()
        sid = 0
        prev = None
        for ts in tss:
            if prev is not None and ts - prev > GAP_US:
                sid += 1
            out[(user, sid)] = out.get((user, sid), 0) + 1
            prev = ts
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3),                      # user
                  st.integers(0, 6 * GAP_US)),            # ts (µs, 6h span)
        min_size=1, max_size=60,
    )
)
def test_sessionization_matches_model(spark, rows):
    # distinct ts per user (the operator orders by ts; model does too —
    # ties would make session assignment order-dependent in both)
    rows = list({(u, t) for u, t in rows})
    df = spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, ts_us long"
    ).select("user_id", F.timestamp_micros(F.col("ts_us")).alias("ts"))

    wo = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(wo)
    sess = (
        df.withColumn("new_sess", F.when(gap > GAP_US, 1).otherwise(0))
        .withColumn("session_id",
                    F.sum("new_sess").over(
                        wo.rangeBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id").count()
    )
    got = {(r.user_id, r.session_id): r["count"] for r in sess.collect()}
    assert got == _sessionize_model(rows)


def _asof_model(clicks, purchases):
    """{purchase_id: click_id or None} — latest strictly-earlier click."""
    out = {}
    for pid, pu, pt in purchases:
        best = None
        for cid, cu, ct in clicks:
            if cu == pu and ct < pt and (
                best is None or (ct, cid) > (best[1], best[0])
            ):
                best = (cid, ct)
        out[pid] = best[0] if best else None
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    clicks=st.lists(st.tuples(st.integers(0, 2),          # user
                              st.integers(0, 50)),        # ts
                    min_size=0, max_size=25),
    purchases=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                       min_size=1, max_size=25),
)
def test_asof_join_matches_model(spark, clicks, purchases):
    c_rows = [(i, u, t) for i, (u, t) in enumerate(clicks)]
    p_rows = [(1000 + i, u, t) for i, (u, t) in enumerate(purchases)]
    c = spark.createDataFrame(
        c_rows or [(None, None, None)], "event_id long, user_id long, ts_us long"
    ).filter(F.col("event_id").isNotNull()).select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_id",
        F.lit(1).alias("kind"),
        F.struct(F.timestamp_micros(F.col("ts_us")).alias("ts"),
                 F.col("event_id")).alias("click"),
    )
    p = spark.createDataFrame(
        p_rows, "event_id long, user_id long, ts_us long"
    ).select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_id",
        F.lit(0).alias("kind"),
        F.lit(None).cast("struct<ts:timestamp,event_id:bigint>").alias("click"),
    )
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    res = (
        c.unionByName(p)
        .withColumn("last_click", F.last("click", ignorenulls=True).over(w))
        .filter(F.col("kind") == 0)
        .select("event_id", F.col("last_click.event_id").alias("click_id"))
    )
    got = {r.event_id: r.click_id for r in res.collect()}
    assert got == _asof_model(c_rows, p_rows)


def _zorder_model(a, b, bits=16):
    z = 0
    for i in range(bits):
        z |= ((a % (1 << bits)) >> i & 1) << (2 * i)
        z |= ((b % (1 << bits)) >> i & 1) << (2 * i + 1)
    return z


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(st.integers(0, 1 << 20),
                                st.integers(0, 1 << 20)),
                      min_size=1, max_size=40))
def test_zorder_key_matches_model(spark, pairs):
    """zorder_key == the bit-interleave model for arbitrary ints
    (including values past the 16-bit wrap)."""
    from zio_kinesis_example_spark.api import zorder_key
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {(r.a, r.b): r.zval for r in zorder_key(df, "a", "b").collect()}
    for a, b in pairs:
        assert got[(a, b)] == _zorder_model(a, b)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(st.tuples(st.integers(0, 500),   # id
                               st.integers(0, 3)),    # group
                     min_size=1, max_size=60, unique_by=lambda t: t[0]),
       budget=st.integers(1, 50))
def test_temperature_sample_invariants(spark, rows, budget):
    """Per-group kept counts never exceed ⌊budget·w_g/Σw⌋, selection is
    the smallest-hash prefix, and reruns are identical."""
    from zio_kinesis_example_spark.api import temperature_sample
    df = spark.createDataFrame(
        [(i, f"g{g}") for i, g in rows], "id long, grp string")
    out = temperature_sample(df, "grp", "id", budget=budget).collect()
    from collections import Counter
    import math
    n_g = Counter(f"g{g}" for _, g in rows)
    w = {g: math.floor(math.sqrt(n) * 1000) for g, n in n_g.items()}
    tw = sum(w.values())
    targets = {g: (w[g] * budget) // tw for g in w}
    kept = Counter(r.grp for r in out)
    for g, k in kept.items():
        assert k <= targets[g]
        assert k == min(targets[g], n_g[g])
    # deterministic prefix: kept ids are the target-smallest by hash
    # rank (the impl ranks on xxhash64 — read the same hash back from
    # Spark rather than re-implementing it in Python)
    from pyspark.sql import functions as F
    hashes = {r.id: r.h for r in
              df.select("id", F.xxhash64("id").alias("h")).collect()}
    by_g = {}
    for i, g in rows:
        by_g.setdefault(f"g{g}", []).append(i)
    kept_ids = {r.grp: set() for r in out}
    for r in out:
        kept_ids[r.grp].add(r.id)
    for g, ids in by_g.items():
        ids.sort(key=lambda i: (hashes[i], i))
        want = set(ids[:targets.get(g, 0)])
        assert kept_ids.get(g, set()) == want


def _asof_forward_model(clicks, purchases):
    """{click_id: purchase_id or None} — earliest strictly-later purchase
    (ties on ts broken by smaller purchase id)."""
    out = {}
    for cid, cu, ct in clicks:
        best = None
        for pid, pu, pt in purchases:
            if pu == cu and pt > ct and (
                best is None or (pt, pid) < (best[1], best[0])
            ):
                best = (pid, pt)
        out[cid] = best[0] if best else None
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    clicks=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                    min_size=1, max_size=25),
    purchases=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                       min_size=0, max_size=25),
)
def test_asof_forward_matches_model(spark, clicks, purchases):
    """The forward as-of formulation (q_join_asof_forward's window) vs a
    brute-force model — including ts COLLISIONS between clicks and
    purchases, where the strict inequality must hold (purchases sort
    before clicks at equal ts, so the following frame skips them)."""
    c_rows = [(i, u, t) for i, (u, t) in enumerate(clicks)]
    p_rows = [(1000 + i, u, t) for i, (u, t) in enumerate(purchases)]
    c = spark.createDataFrame(
        c_rows, "event_id long, user_id long, ts_us long"
    ).select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("struct<ts:timestamp,event_id:bigint>")
         .alias("purchase"),
    )
    p = spark.createDataFrame(
        p_rows or [(None, None, None)],
        "event_id long, user_id long, ts_us long"
    ).filter(F.col("event_id").isNotNull()).select(
        "user_id", F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_id",
        F.lit(0).alias("kind"),
        F.struct(F.timestamp_micros(F.col("ts_us")).alias("ts"),
                 F.col("event_id")).alias("purchase"),
    )
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "kind", "event_id")
         .rowsBetween(1, Window.unboundedFollowing))
    res = (
        c.unionByName(p)
        .withColumn("nxt", F.first("purchase", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", F.col("nxt.event_id").alias("purchase_id"))
    )
    got = {r.event_id: r.purchase_id for r in res.collect()}
    assert got == _asof_forward_model(c_rows, p_rows)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(st.tuples(st.integers(0, 8),            # group
                            st.integers(0, 12)),          # item
                  min_size=1, max_size=80),
    min_support=st.integers(1, 3),
)
def test_cooccurrence_pairs_matches_model(spark, rows, min_support):
    """cooccurrence_pairs ≡ the brute-force model: count, over groups,
    every unordered pair of distinct items co-present in the group."""
    from zio_kinesis_example_spark.api import cooccurrence_pairs

    model = {}
    by_group = {}
    for g, i in set(rows):
        by_group.setdefault(g, set()).add(i)
    for items in by_group.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                k = (s[x], s[y])
                model[k] = model.get(k, 0) + 1
    model = {k: v for k, v in model.items() if v >= min_support}

    df = spark.createDataFrame(rows, "g int, item int")
    got = {(r.item_a, r.item_b): r.together
           for r in cooccurrence_pairs(df, "g", "item",
                                       min_support=min_support).collect()}
    assert got == model


# --- codec fuzz: arbitrary bytes must never crash a decoder ---------------
#
# The three real-format decoders (BMP, WAV, PPM) are vectorized numpy
# kernels full of offset arithmetic over untrusted buffers — the classic
# out-of-bounds surface. Property: for ANY byte payloads (including
# truncated valid prefixes and pure noise), the kernel returns one row per
# input with ok=False for malformed files, and never raises.

def _fuzz_decode(decoder, payloads):
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": range(len(payloads)),
                        "payload": payloads})
    out = pd.concat(decoder(iter([pdf]))).reset_index(drop=True)
    assert len(out) == len(payloads)
    return out


def _codec_corpus(data_strategy):
    from hypothesis import strategies as st

    # mix pure noise with magic-prefixed noise so header parsing runs
    return st.lists(
        st.one_of(
            st.binary(max_size=200),
            st.binary(max_size=120).map(lambda b: b"BM" + b),
            st.binary(max_size=120).map(lambda b: b"P6\n" + b),
            st.binary(max_size=120).map(lambda b: b"RIFF" + b),
        ),
        min_size=1, max_size=8,
    )


def test_fuzz_bmp_decoder_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zio_kinesis_example_spark.operators.multimodal import (
        bmp_decode_batch)

    @given(_codec_corpus(st.binary))
    @settings(max_examples=60, deadline=None)
    def run(payloads):
        out = _fuzz_decode(bmp_decode_batch, payloads)
        assert out.bmp_ok.dtype == bool

    run()


def test_fuzz_ppm_decoder_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zio_kinesis_example_spark.operators.multimodal import (
        ppm_decode_batch)

    @given(_codec_corpus(st.binary))
    @settings(max_examples=60, deadline=None)
    def run(payloads):
        out = _fuzz_decode(ppm_decode_batch, payloads)
        assert out.ppm_ok.dtype == bool

    run()


def test_fuzz_wav_decoder_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zio_kinesis_example_spark.operators.pipeline_ext import (
        wav_decode_batch)

    @given(_codec_corpus(st.binary))
    @settings(max_examples=60, deadline=None)
    def run(payloads):
        out = _fuzz_decode(wav_decode_batch, payloads)
        assert len(out.columns) > 1

    run()


def _asof_null_model(clicks, purchases):
    """api.asof_join's contract under NULLs (r8 review class, now
    property-locked): NULL-right_ts rows are EXCLUDED (NULL is not
    'less than' anything); NULL keys group null-safely as ONE ordinary
    key (the merge_upsert convention); a NULL-left_ts purchase matches
    nothing (its preceding frame holds only other NULL-ts rows, all
    excluded or payload-free)."""
    out = {}
    live = [(cid, cu, ct) for cid, cu, ct in clicks if ct is not None]
    for pid, pu, pt in purchases:
        best = None
        if pt is not None:
            for cid, cu, ct in live:
                if cu == pu and ct < pt and (
                    best is None or (ct, cid) > (best[1], best[0])
                ):
                    best = (cid, ct)
        out[pid] = best[0] if best else None
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    clicks=st.lists(st.tuples(st.one_of(st.none(), st.integers(0, 2)),
                              st.one_of(st.none(), st.integers(0, 50))),
                    min_size=0, max_size=20),
    purchases=st.lists(st.tuples(st.one_of(st.none(), st.integers(0, 2)),
                                 st.one_of(st.none(), st.integers(0, 50))),
                       min_size=1, max_size=20),
)
def test_asof_join_null_keys_and_ts_match_model(spark, clicks, purchases):
    """NULL-key windows property sweep (r8 recurring class #1): asof
    over streams where keys AND timestamps can be NULL must match the
    documented model — no NULLS-FIRST frame pollution, no NULL-key
    row silently matching every partition."""
    from zio_kinesis_example_spark import api

    c_rows = [(i, u, t) for i, (u, t) in enumerate(clicks)]
    p_rows = [(1000 + i, u, t) for i, (u, t) in enumerate(purchases)]
    c = spark.createDataFrame(
        c_rows or [(None, None, None)],
        "click_id long, user_id long, ts_us long"
    ).filter(F.col("click_id").isNotNull()).select(
        "click_id", "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"))
    p = spark.createDataFrame(
        p_rows, "purchase_id long, user_id long, ts_us long"
    ).select("purchase_id", "user_id",
             F.timestamp_micros(F.col("ts_us")).alias("ts"))
    res = api.asof_join(p, c, key="user_id", left_ts="ts", right_ts="ts",
                        right_cols=["ts", "click_id"])
    got = {r.purchase_id: r.asof_click_id for r in res.collect()}
    assert got == _asof_null_model(c_rows, p_rows)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(
    st.one_of(st.integers(0, 2**32), st.integers(0, 2**62)),
    min_size=1, max_size=30, unique=True))
def test_knuth_draw_matches_bigint_model_at_scale(spark, keys):
    """At-scale int64 products property sweep (r8 recurring class #2):
    the 16-bit-split Knuth draw equals Python's arbitrary-precision
    (key · KNUTH) mod 2^32 for keys up to 2^62 — the direct int64
    product overflows under ANSI for keys above ~3.47e9, which is
    exactly the snowflake-id domain the split form exists for."""
    from zio_kinesis_example_spark.operators.advanced import (
        _KNUTH, _U32, _knuth_draw)

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.draw for r in df.select(
        "k", F.expr(_knuth_draw("k", "DIV")).alias("draw")).collect()}
    assert got == {k: (k * _KNUTH) % _U32 for k in keys}


def test_flat_batch_segment_sums_match_python():
    """The flat-buffer primitives every codec kernel builds on: for ANY
    list of byte payloads, _flat_batch offsets partition the buffer
    exactly and _segment_sums equals the per-payload Python sum —
    including empty payloads adjacent to full ones (the reduceat
    clamping regression class)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zio_kinesis_example_spark.operators.multimodal import (
        _flat_batch, _segment_sums)

    @given(st.lists(st.binary(max_size=64), min_size=1, max_size=12))
    @settings(max_examples=200, deadline=None)
    def run(payloads):
        buf, starts, lens = _flat_batch(payloads)
        assert list(lens) == [len(p) for p in payloads]
        got = _segment_sums(buf, starts, starts + lens)
        assert list(got) == [sum(p) for p in payloads]

    run()
