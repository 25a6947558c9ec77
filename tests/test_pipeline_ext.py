"""Semantic + plan-shape tests for the round-4 pipeline extensions
(operators/pipeline_ext.py). Oracle parity for all five queries is covered
by test_oracle_parity.py; these tests pin the semantics the oracle can't
see (hand-written WAV fixtures, malformed payloads, identity invariants)
and the physical plan shapes the scale story depends on."""

from __future__ import annotations

import contextlib
import io
import struct

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StructField, StructType,
)

from zio_kinesis_example_spark.operators.pipeline_ext import (
    WAV_DECODE_SCHEMA, q_embed_pq, wav_decode_batch,
)
from zio_kinesis_example_spark.registry import all_specs

from .conftest import SF_SMALL

_PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
])


def _decode(spark, payloads: dict[int, bytes]) -> dict[int, dict]:
    df = spark.createDataFrame(
        [(k, v) for k, v in payloads.items()], schema=_PAYLOAD_SCHEMA
    ).mapInPandas(wav_decode_batch, schema=WAV_DECODE_SCHEMA)
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def _wav_bytes(samples: list[int], channels: int = 1, rate: int = 44100,
               pre_chunks: bytes = b"") -> bytes:
    """Hand-written canonical PCM WAV, independent of the encoder under
    test: optional extra chunks before fmt exercise the walk."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = pre_chunks + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


class TestWavDecode:
    def test_hand_written_fixture(self, spark):
        samples = [0, 1000, -1000, 32767, -32768, 7]
        out = _decode(spark, {1: _wav_bytes(samples, channels=2, rate=8000)})
        r = out[1]
        assert r["wav_ok"] is True
        assert r["channels"] == 2
        assert r["sample_rate"] == 8000
        assert r["bits"] == 16
        assert r["n_frames"] == 3          # 6 samples / 2 channels
        assert r["first_sample"] == 0
        assert r["abs_energy"] == sum(abs(s) for s in samples)

    def test_chunk_walk_skips_unknown_chunks_with_pad(self, spark):
        # a 3-byte (odd → padded) chunk BEFORE fmt: a reader that
        # hardcodes offsets or forgets the pad rule misparses this
        junk = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
        out = _decode(spark, {7: _wav_bytes([5, -5], pre_chunks=junk)})
        assert out[7]["wav_ok"] is True
        assert out[7]["abs_energy"] == 10
        assert out[7]["n_frames"] == 2

    def test_malformed_payloads_flagged_not_crashed(self, spark):
        out = _decode(spark, {
            1: b"",                          # empty
            2: b"RIFFxxxx",                  # truncated header
            3: b"JFIF" + b"\x00" * 60,       # wrong magic
            4: _wav_bytes([1])[:20],         # truncated mid-chunk
        })
        assert all(not out[k]["wav_ok"] for k in (1, 2, 3, 4))
        # n_bytes still reported for observability
        assert out[3]["n_bytes"] == 64

    def test_valid_wav_followed_by_garbage_in_same_batch(self, spark):
        # regression: reduceat segment clamping used to drop the final
        # sample of the last valid WAV when an invalid payload followed
        # it in the batch
        out = _decode(spark, {
            1: _wav_bytes([100, 200, 300]),
            2: b"",
            3: b"RIFFxxxx",
        })
        assert out[1]["wav_ok"] is True
        assert out[1]["abs_energy"] == 600
        assert not out[2]["wav_ok"] and not out[3]["wav_ok"]

    def test_non_pcm_format_rejected(self, spark):
        wav = bytearray(_wav_bytes([1, 2]))
        wav[20] = 3                           # audio_format = IEEE float
        out = _decode(spark, {9: bytes(wav)})
        assert out[9]["wav_ok"] is False


class TestPq:
    def test_codebook_vectors_code_to_themselves(self, spark):
        # the 16 smallest vec_ids ARE the codebook → each must be
        # assigned its own index in both subspaces with zero error
        out = q_embed_pq(spark, SF_SMALL)
        rows = {r["vec_id"]: r for r in out.collect()}
        cb_ids = sorted(rows)[:16]
        for j, vid in enumerate(cb_ids):
            r = rows[vid]
            assert (r["code0"], r["code1"], r["qerr"]) == (j, j, 0), vid

    def test_codes_in_range_and_qerr_nonnegative(self, spark):
        out = q_embed_pq(spark, SF_SMALL).agg(
            F.min("code0"), F.max("code0"), F.min("code1"), F.max("code1"),
            F.min("qerr")).first()
        assert out[0] >= 0 and out[1] < 16
        assert out[2] >= 0 and out[3] < 16
        assert out[4] >= 0


class TestSpansAndContainment:
    def test_identical_docs_fully_duplicated(self, spark, tmpdir_factory_local):
        d = tmpdir_factory_local("spans")
        text = " ".join(f"w{i}" for i in range(20))
        other = " ".join(f"x{i}" for i in range(20))
        spark.createDataFrame(
            [(1, text), (2, text), (3, other)], ["doc_id", "text"]
        ).withColumn("lang", F.lit("en")) \
         .withColumn("source", F.lit("s")) \
         .withColumn("n_chars", F.length("text").cast("long")) \
         .write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in
               all_specs()["q_dedup_spans"].fn(spark, d).collect()}
        assert out[1]["dup_share"] == 1.0 and out[2]["dup_share"] == 1.0
        assert out[3]["dup_share"] == 0.0
        assert out[1]["n_spans"] == 13     # 20 - 8 + 1

    def test_subset_doc_has_full_containment(self, spark,
                                             tmpdir_factory_local):
        d = tmpdir_factory_local("cont")
        big = " ".join(f"w{i}" for i in range(30))
        small = " ".join(f"w{i}" for i in range(10))   # strict prefix
        spark.createDataFrame(
            [(1, small), (2, big)], ["doc_id", "text"]
        ).withColumn("lang", F.lit("en")) \
         .withColumn("source", F.lit("s")) \
         .withColumn("n_chars", F.length("text").cast("long")) \
         .write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = all_specs()["q_text_containment"].fn(spark, d).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["cont_ab"] == 1.0         # small fully inside big
        assert r["cont_ba"] < 1.0


class TestDriftChi2:
    def test_uniform_source_not_drifted_skewed_source_is(
            self, spark, tmpdir_factory_local):
        d = tmpdir_factory_local("drift")
        rows = []
        i = 0
        # three balanced sources dominate the corpus mix; one skewed
        # source (all docs in one lang) must stand out against it
        for src in ("bal", "bal2", "bal3"):
            for lang in ("aa", "bb", "cc", "dd"):
                for _ in range(10):
                    rows.append((i, f"t {i}", lang, src)); i += 1
        for _ in range(40):
            rows.append((i, f"t {i}", "aa", "skew")); i += 1
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source"]
        ).withColumn("n_chars", F.length("text").cast("long")) \
         .write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r["source"]: r for r in
               all_specs()["q_curate_drift_chi2"].fn(spark, d).collect()}
        assert out["skew"]["drifted"] is True
        assert out["bal"]["chi2"] < out["skew"]["chi2"]
        assert out["bal"]["n_docs"] == out["skew"]["n_docs"] == 40


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:
    import pandas as pd

    _samples = st.lists(st.integers(-32768, 32767), min_size=1, max_size=40)
    _junk = st.lists(
        st.tuples(st.sampled_from([b"LIST", b"JUNK", b"bext"]),
                  st.binary(min_size=0, max_size=9)),
        min_size=0, max_size=3)

    def _chunks(tag: bytes, body: bytes) -> bytes:
        return (struct.pack("<4sI", tag, len(body)) + body
                + (b"\x00" if len(body) % 2 else b""))

    @settings(max_examples=40, deadline=None)
    @given(samples=_samples, channels=st.integers(1, 2),
           rate=st.integers(1, 192000), pre=_junk, post=_junk)
    def test_wav_decode_matches_model_property(samples, channels, rate,
                                               pre, post):
        """Random PCM content + random unknown chunks on either side of
        fmt: the vectorized decoder must agree with the independent
        layout model (frames truncate to whole frames; energy is the
        exact |sample| sum over decoded frames)."""
        pre_b = b"".join(_chunks(t, b) for t, b in pre)
        post_b = b"".join(_chunks(t, b) for t, b in post)
        data = b"".join(struct.pack("<h", s) for s in samples)
        fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels, rate,
                          rate * channels * 2, channels * 2, 16)
        body = (pre_b + fmt + post_b
                + struct.pack("<4sI", b"data", len(data)) + data)
        wav = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body

        pdf = pd.DataFrame({"doc_id": [0], "payload": [wav]})
        r = pd.concat(wav_decode_batch(iter([pdf]))).iloc[0]
        n_frames = len(data) // (2 * channels)
        used = samples[: n_frames * channels]
        assert bool(r.wav_ok) is True
        assert r.channels == channels and r.sample_rate == rate
        assert r.n_frames == n_frames
        assert r.abs_energy == sum(abs(s) for s in used)
        assert r.first_sample == (used[0] if used else 0)

    @settings(max_examples=30, deadline=None)
    @given(st.binary(min_size=0, max_size=80))
    def test_wav_decode_never_crashes_on_noise(payload):
        pdf = pd.DataFrame({"doc_id": [0], "payload": [payload]})
        r = pd.concat(wav_decode_batch(iter([pdf]))).iloc[0]
        assert r.n_bytes == len(payload)


def _spans_model(docs: dict[int, str], k: int = 8):
    """Pure-Python repeated-span model: {doc: (n_spans, n_dup)}."""
    spans = {
        d: [" ".join(t[i:i + k])
            for t in [txt.split(" ")]
            for i in range(len(t) - k + 1)]
        for d, txt in docs.items()
    }
    owners: dict[str, set] = {}
    for d, sp in spans.items():
        for s in sp:
            owners.setdefault(s, set()).add(d)
    return {
        d: (len(sp), sum(1 for s in sp if len(owners[s]) >= 2))
        for d, sp in spans.items()
    }


@pytest.mark.parametrize("seed", [1, 2])
def test_spans_match_model_on_random_corpus(spark, tmpdir_factory_local,
                                            seed):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → real collisions
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25)))
        for d in range(30)
    }
    p = tmpdir_factory_local("spanprop")
    spark.createDataFrame(
        [(d, t) for d, t in docs.items()], ["doc_id", "text"]
    ).withColumn("lang", F.lit("en")) \
     .withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text").cast("long")) \
     .write.mode("overwrite").parquet(f"{p}/documents.parquet")
    out = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"]) for r in
           all_specs()["q_dedup_spans"].fn(spark, p).collect()}
    assert out == _spans_model(docs)


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = all_specs()[name].fn(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


class TestPlans:
    def test_pq_assignment_is_shuffle_free(self, spark):
        # codebook is literal driver state → one stateless scan
        plan = _plan(spark, "q_embed_pq")
        assert "Exchange" not in plan

    def test_spans_dup_set_broadcasts_back(self, spark):
        # the duplicated-span set joins back via broadcast — the
        # corpus-side span stream never shuffles for the join
        plan = _plan(spark, "q_dedup_spans")
        assert "BroadcastHashJoin" in plan

    def test_drift_grid_joins_are_broadcast(self, spark):
        # everything after the corpus groupBy is bounded-size broadcast
        # arithmetic: no sort-merge join anywhere
        plan = _plan(spark, "q_curate_drift_chi2")
        assert "SortMergeJoin" not in plan

    def test_wav_codec_is_one_fused_arrow_stage_no_shuffle(self, spark):
        # round-7 fusion: encode+decode chained inside ONE Python stage
        # (multimodal.fused_round_trip) — one worker per task
        plan = _plan(spark, "q_multimodal_wav_decode", mode="simple")
        assert plan.count("MapInPandas") == 1
        assert "Exchange" not in plan

    def test_bloom_probe_side_never_joins_for_the_filter(self, spark):
        # the bitmap rides as a literal: the ONLY join in the plan is the
        # exact-verification broadcast; the fact side never sort-merges
        plan = _plan(spark, "q_join_bloom_semi", mode="simple")
        assert "SortMergeJoin" not in plan
        assert plan.count("BroadcastHashJoin") == 1

    def test_heavy_hitters_sketch_materializes_once(self, spark):
        # the MG summary is eagerly checkpointed (ONE sketch execution);
        # the final plan reads the materialized summary (ExistingRDD) on
        # both the est and err_total branches, and nothing sort-merges
        plan = _plan(spark, "q_events_heavy_hitters", mode="simple")
        assert "ExistingRDD" in plan
        assert "MapInPandas" not in plan     # not re-evaluated in-plan
        assert "SortMergeJoin" not in plan

    def test_asof_nearest_single_window_sort(self, spark):
        # both directional frames share ONE user-keyed sort: exactly one
        # Window node, no joins anywhere
        plan = _plan(spark, "q_ts_asof_nearest", mode="simple")
        assert plan.count("Window") == 1
        assert "Join" not in plan


class TestBatch2:
    def test_vocab_dedup_groups_reordered_docs(self, spark,
                                               tmpdir_factory_local):
        d = tmpdir_factory_local("vocab")
        spark.createDataFrame(
            [(1, "a b c"), (2, "c b a a b"), (3, "a b c d")],
            ["doc_id", "text"]
        ).withColumn("lang", F.lit("en")) \
         .withColumn("source", F.lit("s")) \
         .withColumn("n_chars", F.length("text").cast("long")) \
         .write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = all_specs()["q_dedup_vocab"].fn(spark, d).collect()
        assert len(rows) == 1      # docs 1+2 share vocabulary {a,b,c}
        assert rows[0]["canonical_doc_id"] == 1
        assert rows[0]["member_ids"] == "1,2"

    def test_cdc_delete_semantics(self, spark):
        out = all_specs()["q_merge_cdc_delete"].fn(spark, SF_SMALL)
        rows = {r["c_custkey"]: r for r in out.collect()}
        # deletes gone (custkey % 10 == 0); inserts carry NEGATIVE
        # synthetic keys (collision-free with real custkeys at any SF)
        assert not any(k % 10 == 0 for k in rows if k > 0)
        inserted = [k for k in rows if k < 0]
        assert inserted and all(rows[k]["c_name"].startswith("NEW #")
                                for k in inserted)

    def test_mg_kernel_negative_user_ids_survive(self):
        """The r6 review fix: the error sentinel is OUT-OF-BAND
        (is_err), so a real user with id -1 — a heavy hitter here —
        keeps its estimate instead of merging with the sentinel and
        being filtered out."""
        import pandas as pd

        from zio_kinesis_example_spark.operators.pipeline_ext import (
            mg_summarize,
        )
        ids = [-1] * 500 + list(range(1, 101))
        out = pd.concat(mg_summarize(iter(
            [pd.DataFrame({"user_id": ids})])))
        real = out[out.is_err == 0]
        assert int(real[real.user_id == -1]["est"].sum()) == 500
        assert (out[out.is_err == 1]["user_id"] == 0).all()

    def test_mg_kernel_bounds(self):
        import pandas as pd

        from zio_kinesis_example_spark.operators.pipeline_ext import (
            _MG_K, mg_summarize,
        )
        # skewed stream: key 0 is hot, the long tail forces compression
        ids = [0] * 5000 + list(range(1, 4001)) * 2
        batches = [pd.DataFrame({"user_id": ids[i:i + 1000]})
                   for i in range(0, len(ids), 1000)]
        out = pd.concat(mg_summarize(iter(batches)))
        err = int(out[out.is_err == 1]["err"].sum())
        summary = out[out.is_err == 0]
        assert len(summary) <= _MG_K
        n = len(ids)
        assert 0 < err <= n // (_MG_K + 1) + 1
        est0 = int(summary[summary.user_id == 0]["est"].sum())
        assert 5000 - err <= est0 <= 5000   # undercount within bound

    def test_bloom_audit_invariants(self, spark):
        r = all_specs()["q_join_bloom_semi"].fn(spark, SF_SMALL).first()
        assert r["no_false_negatives"] is True
        assert r["n_candidates"] >= r["n_exact"]
        assert r["n_false_pos"] == r["n_candidates"] - r["n_exact"]
        assert 0 < r["bits_set"] <= 3 * r["n_keys"]

    def test_asof_nearest_prefers_earlier_on_tie(self, spark,
                                                 tmpdir_factory_local):
        import datetime as dt

        d = tmpdir_factory_local("nearest")
        base = dt.datetime(2024, 1, 1)

        def ts(sec):
            return base + dt.timedelta(seconds=sec)

        rows = [
            (1, ts(10), 7, "click", 0.0, "{}"),
            (2, ts(20), 7, "purchase", 0.0, "{}"),   # equidistant 10s
            (3, ts(30), 7, "click", 0.0, "{}"),
            (4, ts(100), 7, "purchase", 0.0, "{}"),  # only earlier click
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string"
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r["event_id"]: r for r in
               all_specs()["q_ts_asof_nearest"].fn(spark, d).collect()}
        assert out[2]["delta_us"] == -10_000_000    # tie → earlier click
        assert out[4]["nearest_click_us"] == out[2]["nearest_click_us"] \
            + 20_000_000                             # click at t=30


class TestBatch3:
    def test_triangle_count_on_known_graph(self, spark):
        # closed form on the fixture graph is unknown, but the census
        # must satisfy the structural identities
        r = all_specs()["q_graph_triangles"].fn(spark, SF_SMALL).first()
        assert r["n_wedges"] >= 3 * r["n_triangles"]
        assert 0 <= r["transitivity"] <= 1.0
        assert r["n_nodes"] > 0 and r["n_edges"] > 0

    def test_countmin_never_undercounts(self, spark):
        out = all_specs()["q_agg_countmin"].fn(spark, SF_SMALL)
        bad = out.filter(F.col("overcount") < 0).count()
        assert bad == 0
        assert out.filter(F.col("cm_est") < F.col("cnt")).count() == 0

    def test_grid_knn_rank_contract(self, spark):
        out = all_specs()["q_join_grid_knn"].fn(spark, SF_SMALL)
        import pyspark.sql.functions as f
        per = out.groupBy("id").agg(
            f.count(f.lit(1)).alias("n"), f.max("rnk").alias("mx"),
            f.min("rnk").alias("mn"))
        assert per.filter("n > 3 OR mx > 3 OR mn != 1").count() == 0
        # neighbors are within the radius
        assert out.filter("cheb_dist > 5 OR nbr = id").count() == 0

    def test_seasonal_residuals_center_on_zero(self, spark):
        out = all_specs()["q_ts_seasonal"].fn(spark, SF_SMALL)
        per_group = out.groupBy("event_type", "hod").agg(
            F.round(F.sum("residual"), 2).alias("s"))
        # residuals within each profile group sum to ~0 (exact up to the
        # 6dp rounding of each residual)
        mx = per_group.agg(F.max(F.abs(F.col("s")))).first()[0]
        assert mx < 0.01

    def test_session_stats_with_tied_timestamps(self, spark,
                                                tmpdir_factory_local):
        import datetime as dt

        d = tmpdir_factory_local("sess")
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 5, "view", 0.0, "{}"),
            (2, t0, 5, "click", 0.0, "{}"),                # tied ts
            (3, t0 + dt.timedelta(hours=2), 5, "view", 0.0, "{}"),
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string"
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        r = all_specs()["q_events_session_stats"].fn(spark, d).first()
        assert r["n_sessions"] == 2
        assert r["n_events"] == 3
        assert r["total_duration_us"] == 0   # both sessions zero-width

    def test_session_stats_totals_match_event_count(self, spark):
        out = all_specs()["q_events_session_stats"].fn(spark, SF_SMALL)
        total_events = out.agg(F.sum("n_events")).first()[0]
        from zio_kinesis_example_spark.catalog import load
        assert total_events == load(spark, SF_SMALL, "events").count()


class TestBatch4:
    def test_incremental_dedup_split_covers_new_batch(self, spark):
        out = all_specs()["q_dedup_incremental"].fn(spark, SF_SMALL)
        rows = out.collect()
        assert rows and all(r["doc_id"] % 5 == 4 for r in rows)
        for r in rows:
            if r["dup_of_history"]:
                assert r["canonical_doc_id"] % 5 != 4
            else:
                assert r["canonical_doc_id"] is None

    def test_incremental_dedup_detects_planted_duplicate(
            self, spark, tmpdir_factory_local):
        # the fixture corpus has no exact dup crossing the %5 split, so
        # plant one: doc 9 (new batch) repeats doc 10's text (history)
        d = tmpdir_factory_local("incr")
        spark.createDataFrame(
            [(9, "same text here"), (10, "same text here"),
             (14, "only in the new batch"), (2, "unrelated history")],
            ["doc_id", "text"]
        ).withColumn("lang", F.lit("en")) \
         .withColumn("source", F.lit("s")) \
         .withColumn("n_chars", F.length("text").cast("long")) \
         .write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in
               all_specs()["q_dedup_incremental"].fn(spark, d).collect()}
        assert set(out) == {9, 14}
        assert out[9]["dup_of_history"] is True
        assert out[9]["canonical_doc_id"] == 10
        assert out[14]["dup_of_history"] is False

    def test_attribution_conserves_value(self, spark,
                                         tmpdir_factory_local):
        import datetime as dt

        d = tmpdir_factory_local("attr")
        t0 = dt.datetime(2024, 1, 1)

        def ts(m):
            return t0 + dt.timedelta(minutes=m)

        rows = [
            (1, ts(0), 5, "click", 0.0, "{}"),
            (2, ts(30), 5, "click", 0.0, "{}"),
            (3, ts(45), 5, "purchase", 10.0, "{}"),   # splits 5/5
            (4, ts(200), 5, "purchase", 8.0, "{}"),   # one click in window
            (5, ts(190), 5, "click", 0.0, "{}"),      # 10 min before #4
            (6, ts(400), 5, "purchase", 3.0, "{}"),   # NO click in window
            #  → purchase 6's value earns no row (unattributed path)
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
                  "event_type string, value double, props string"
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r["click_id"]: r for r in
               all_specs()["q_events_attribution"].fn(spark, d).collect()}
        assert out[1]["credit"] == 5.0 and out[2]["credit"] == 5.0
        assert out[5]["credit"] == 8.0
        assert out[5]["n_attributions"] == 1
        # purchase 6 had no click within the hour → its 3.0 is nowhere
        assert sum(r["credit"] for r in out.values()) == 18.0

    def test_backlog_balances_to_zero(self, spark):
        out = all_specs()["q_ts_backlog"].fn(spark, SF_SMALL)
        from zio_kinesis_example_spark.catalog import load
        n_li = load(spark, SF_SMALL, "lineitem").count()
        sums = out.agg(F.sum("n_ordered"), F.sum("n_shipped")).first()
        # every lineitem contributes exactly one +1 and one -1
        assert sums[0] == sums[1] == n_li
        last = out.orderBy(F.col("day").desc()).first()
        # after the final day every ordered line has shipped
        assert last["open_backlog"] == 0


def test_seqlen_overflow_bucket_pads_zero(spark):
    """EVERY doc longer than the top menu length (4096) lands in the
    overflow bucket (8192) with ZERO padding waste — the trainer
    truncates it (r9 review: the earlier least() clamp only zeroed docs
    ≥ 8192, so a 4097-token doc fabricated 8192−4097 of waste)."""
    from zio_kinesis_example_spark.operators.pipeline_ext5 import (
        _SEQLEN_MENU, _seqlen_case,
    )

    top = _SEQLEN_MENU[-1]
    row = spark.sql(
        f"SELECT CAST({_seqlen_case('n')} AS BIGINT) AS bucket, "
        f"CASE WHEN n > {top} THEN 0 "
        f"ELSE CAST({_seqlen_case('n')} AS BIGINT) - n END AS waste "
        "FROM VALUES (10000L), (4096L), (4097L), (10L) AS t(n)"
    ).collect()
    got = {(r.bucket, r.waste) for r in row}
    assert (8192, 0) in got          # 10000-token doc: truncates, pads 0
    assert (4096, 0) in got          # exact fit
    assert got == {(8192, 0), (4096, 0), (16, 6)}  # 4097 also pads ZERO
