"""The reusable operator library (api.py) on arbitrary in-memory frames —
proving the algorithms are not bound to the testdata tables."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from zio_kinesis_example_spark import api


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_generic(spark):
    trades = spark.createDataFrame(
        [("A", _ts(0, 5), 100), ("A", _ts(2, 0), 101), ("B", _ts(1, 0), 200)],
        "sym string, t timestamp, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", _ts(0, 0), 9.9), ("A", _ts(1, 0), 10.1), ("B", _ts(2, 0), 20.0)],
        "sym string, t timestamp, px double",
    )
    out = api.asof_join(trades, quotes, key="sym",
                        left_ts="t", right_ts="t", right_cols=["px"])
    got = {r.trade_id: r.asof_px for r in out.collect()}
    assert got == {100: 9.9, 101: 10.1, 200: None}


def test_sessionize_and_pack_generic(spark):
    rows = [("u", _ts(0)), ("u", _ts(10)), ("u", _ts(40)), ("v", _ts(0))]
    df = spark.createDataFrame(rows, "user string, t timestamp")
    sess = api.sessionize(df, ["user"], "t", gap_seconds=900)
    got = {(r.user, r.t.minute): r.session_id for r in sess.collect()}
    assert got == {("u", 0): 0, ("u", 10): 0, ("u", 40): 1, ("v", 0): 0}

    docs = spark.createDataFrame(
        [("en", i, 600) for i in range(5)], "lang string, i long, n long")
    packed = api.pack_sequences(docs, ["lang"], "i", "n", bin_size=2048)
    bins = [r.seq_bin for r in packed.orderBy("i").collect()]
    assert bins == [0, 0, 0, 0, 1]  # 4th doc starts at 2400 -> bin 1


def test_pack_sequences_preserves_caller_temp_name(spark):
    """r9 advice: the staging cumsum must not clobber a caller column
    that happens to share the helper's temp name — the name is generated
    collision-proof, and every input column survives in the result."""
    docs = spark.createDataFrame(
        [("en", i, 1100, f"keep{i}") for i in range(3)],
        "lang string, i long, n long, __zke_pack_before string")
    packed = api.pack_sequences(docs, ["lang"], "i", "n", bin_size=2048)
    assert "__zke_pack_before" in packed.columns
    rows = packed.orderBy("i").collect()
    assert [r["__zke_pack_before"] for r in rows] == \
        ["keep0", "keep1", "keep2"]
    assert [r.seq_bin for r in rows] == [0, 0, 1]


def test_configure_reaches_cloned_sessions(spark):
    """r9 advice: SparkSession.newSession() shares the applicationId but
    carries its OWN SQLConf — configure() must be memoized per session
    object, so the correctness-bearing runtime confs (UTC timezone,
    nanosAsLong) land on the clone too."""
    from zio_kinesis_example_spark import catalog

    clone = spark.newSession()
    try:
        clone.conf.set("spark.sql.session.timeZone", "America/New_York")
        catalog.configure(clone)
        assert clone.conf.get("spark.sql.session.timeZone") == "UTC"
        # parent session untouched by the clone's detour
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        clone.conf.set("spark.sql.session.timeZone", "UTC")


def test_merge_and_dedup_generic(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string")
    delta = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k long, v string")
    merged = {r.k: r.v for r in api.merge_upsert(base, delta, "k").collect()}
    assert merged == {1: "a", 2: "B", 3: "c"}

    events = spark.createDataFrame(
        [(1, _ts(0), "x"), (1, _ts(5), "y"), (2, _ts(1), "z")],
        "k long, t timestamp, v string")
    latest = api.dedup_latest(events, ["k"], [F.col("t").desc()])
    assert {r.k: r.v for r in latest.collect()} == {1: "y", 2: "z"}


def test_salted_join_matches_plain(spark):
    fact = spark.createDataFrame(
        [(i, i % 3) for i in range(100)], "fid long, k long")
    dim = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z")], "dk long, name string")
    salted = api.salted_join(fact, dim, "k", "dk",
                             salt_col=F.col("fid"), n_buckets=4)
    plain = fact.join(dim, fact.k == dim.dk)
    assert sorted((r.fid, r.name) for r in salted.collect()) == \
        sorted((r.fid, r.name) for r in plain.collect())


def test_stratified_sample_generic(spark):
    df = spark.createDataFrame(
        [(f"s{i % 2}", i) for i in range(40)], "stratum string, id long")
    out = api.stratified_sample(df, ["stratum"], "id", 5)
    counts = {r.stratum: r["count"] for r in
              out.groupBy("stratum").count().collect()}
    assert counts == {"s0": 5, "s1": 5}
    # deterministic across invocations
    again = api.stratified_sample(df, ["stratum"], "id", 5)
    assert sorted(r.id for r in out.collect()) == \
        sorted(r.id for r in again.collect())


def test_forward_fill_generic(spark):
    df = spark.createDataFrame(
        [("s", 1, 10.0), ("s", 2, None), ("s", 3, None), ("s", 4, 40.0),
         ("t", 1, None), ("t", 2, 5.0)],
        "series string, seq int, v double",
    )
    out = api.forward_fill(df, ["series"], "seq", "v", alias="filled")
    got = {(r["series"], r["seq"]): r["filled"] for r in out.collect()}
    assert got[("s", 2)] == 10.0 and got[("s", 3)] == 10.0
    assert got[("s", 4)] == 40.0
    assert got[("t", 1)] is None and got[("t", 2)] == 5.0


def test_resample_ohlc_generic(spark):
    rows = [
        ("A", _ts(1), 3.0, 1), ("A", _ts(5), 9.0, 2), ("A", _ts(50), 1.0, 3),
        ("A", _ts(5), 7.0, 4),   # same ts as trade 2: tiebreak on id
    ]
    df = spark.createDataFrame(
        rows, "sym string, t timestamp, px double, tid long")
    out = api.resample_ohlc(df, ["sym"], "t", "px", "tid", unit="hour")
    r = out.collect()[0]
    assert r["open"] == 3.0 and r["close"] == 1.0
    assert r["high"] == 9.0 and r["low"] == 1.0 and r["n_ticks"] == 4


def test_time_bucket_generic(spark):
    df = spark.createDataFrame([( _ts(59, 59),)], "t timestamp")
    out = api.time_bucket(df, "t", unit="hour").collect()[0]
    assert out["bucket"] == dt.datetime(2024, 1, 1, 0, 0, 0)


def test_zorder_key_generic(spark):
    from zio_kinesis_example_spark.api import zorder_key
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int")
    out = {(r.a, r.b): r.zval for r in zorder_key(df, "a", "b").collect()}
    # interleave: a bits at even positions, b bits at odd
    assert out[(0, 0)] == 0 and out[(1, 0)] == 1 and out[(0, 1)] == 2
    assert out[(3, 5)] == 0b100111  # a=11 -> 0b0101, b=101 -> 0b100010


def test_decontaminate_generic(spark):
    from zio_kinesis_example_spark.api import decontaminate
    bench = spark.createDataFrame(
        [(1, "a b c d e f"),
         (2, "a b c d e q")],        # 'a b c d e' appears in BOTH bench
        "id long, text string")      # docs: must count once, not twice
    train = spark.createDataFrame(
        [(10, "a b c d e zz"),       # shares 'a b c d e'
         (11, "x y z w v u"),        # disjoint
         (12, "b c d e f b c d e f")],  # shares 'b c d e f' (distinct once)
        "id long, text string")
    got = {r.id: r.n_shared_grams
           for r in decontaminate(train, bench, "text", "id").collect()}
    # DISTINCT-gram counting on both sides (r9 review: the sf0.01
    # oracle fixture cannot distinguish distinct-vs-duplicate counting,
    # so this unit fixture locks the semantic): train-side repeats of a
    # shared gram count once (doc 12), bench-side duplicates of one
    # gram count once (doc 10 = 1, not 2).
    assert got == {10: 1, 12: 1}


def test_temperature_sample_generic(spark):
    from pyspark.sql import functions as F
    from zio_kinesis_example_spark.api import temperature_sample
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = temperature_sample(df, "grp", "id", budget=50, temperature=2.0)
    counts = {r.grp: r.n for r in
              out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    # sqrt weights: 90->9486, 10->3162 => targets 37 and 12 of 50;
    # the small group only HAS 10 rows, so its target caps at the group
    assert counts == {"big": 37, "small": 10}
    # deterministic: second run identical
    again = temperature_sample(df, "grp", "id", budget=50, temperature=2.0)
    assert sorted(r.id for r in out.collect()) == \
        sorted(r.id for r in again.collect())


def test_kmeans_fit_generic(spark):
    from zio_kinesis_example_spark.api import kmeans_fit
    # two well-separated blobs on a line
    rows = [(i, [float(i % 7) / 100.0, 0.0]) for i in range(40)] + \
           [(100 + i, [10.0 + float(i % 5) / 100.0, 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    out = kmeans_fit(df, "vec", "id", k=2, iters=3)
    by_cluster = {}
    for r in out.collect():
        by_cluster.setdefault(r.cluster_id, set()).add(r.id < 100)
    # each cluster is pure: all low ids or all high ids
    assert all(len(v) == 1 for v in by_cluster.values())
    assert len(by_cluster) == 2
    # partition-invariance of the integer arithmetic
    again = kmeans_fit(df.repartition(7), "vec", "id", k=2, iters=3)
    assert sorted((r.id, r.cluster_id) for r in out.collect()) == \
        sorted((r.id, r.cluster_id) for r in again.collect())


def test_repeated_spans_generic(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "a b c d e f g h i j")],
        "pid long, body string")
    out = {r.pid: r for r in
           api.repeated_spans(df, "body", "pid", k=8).collect()}
    assert out[1].dup_share == 1.0 and out[2].dup_share == 1.0
    assert out[3].n_dup_spans == 0 and out[3].n_spans == 3


def test_containment_pairs_generic(spark):
    big = " ".join(f"w{i}" for i in range(20))
    small = " ".join(f"w{i}" for i in range(8))
    df = spark.createDataFrame([(1, small), (2, big), (3, "x y z")],
                               "pid long, body string")
    rows = api.containment_pairs(df, "body", "pid").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.cont_ab) == (1, 2, 1.0)


def test_pq_assign_generic(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 1.0, 1.0]), (2, [1.0, 1.0, 0.0, 0.0])],
        "pid long, v array<double>")
    s = 1_000_000
    books = [[[0, 0], [s, s]], [[0, 0], [s, s]]]
    out = {r.pid: r for r in
           api.pq_assign(df, "v", "pid", books, scale=s).collect()}
    assert (out[1].code_0, out[1].code_1, out[1].qerr) == (0, 1, 0)
    assert (out[2].code_0, out[2].code_1, out[2].qerr) == (1, 0, 0)


def test_mix_drift_chi2_generic(spark):
    rows = [(f"{g}{i}", g, ["x", "y"][i % 2])
            for g in ("bal", "bal2", "bal3") for i in range(40)]
    rows += [(f"s{i}", "skew", "x") for i in range(40)]
    df = spark.createDataFrame(rows, "rid string, grp string, cls string")
    out = {r.grp: r for r in
           api.mix_drift_chi2(df, "grp", "cls", critical=3.84).collect()}
    assert out["skew"].chi2 > out["bal"].chi2
    assert out["skew"].n_rows == 40 and out["skew"].n_classes == 2


def test_interval_overlap_join_generic(spark):
    # left: [0, 10h], [30h, 31h]; right: [9h, 12h], [50h, 51h]
    H = 3_600_000_000
    left = spark.createDataFrame(
        [(1, 0, 10 * H), (2, 30 * H, 31 * H)], "lid long, s_us long, e_us long")
    right = spark.createDataFrame(
        [(7, 9 * H, 12 * H), (8, 50 * H, 51 * H)],
        "rid long, s_us long, e_us long")
    rows = api.interval_overlap_join(left, right).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.l_lid, r.r_rid, r.overlap_us) == (1, 7, H)
    # a pair spanning multiple shared day-buckets is emitted exactly once
    wide_l = spark.createDataFrame([(1, 0, 72 * H)], "lid long, s_us long, e_us long")
    wide_r = spark.createDataFrame([(7, 0, 72 * H)], "rid long, s_us long, e_us long")
    wide = api.interval_overlap_join(wide_l, wide_r).collect()
    assert len(wide) == 1 and wide[0].overlap_us == 72 * H


def test_interval_overlap_capped_generic(spark):
    """r12 fuse invariants: (a) below the cap the capped self-join is
    IDENTICAL to the exact form and the audit reports zero; (b) above
    it, per-bucket membership never exceeds cap, the audit counts
    exactly the over-cap memberships, and kept pairs are the
    lowest-ranked (s_us-first) intervals — deterministic truncation,
    never sampling."""
    H = 3_600_000_000
    # 5 intervals inside one hour bucket + 1 in another
    ivs = spark.createDataFrame(
        [(i, i * 1000, i * 1000 + 500_000) for i in range(5)]
        + [(9, 10 * H, 10 * H + 1000)],
        "iid long, s_us long, e_us long")

    def pairset(df):
        return {(r.l_iid, r.r_iid, r.overlap_us)
                for r in df.filter("l_iid < r_iid").collect()}

    exact = pairset(api.interval_overlap_join(ivs, ivs, bucket_us=H))
    # cap above occupancy: identical results, zero audit
    pairs, audit = api.interval_overlap_self_join_capped(
        ivs, bucket_us=H, cap=10, tie_cols=("iid",))
    assert pairset(pairs) == exact
    a = audit.collect()[0]
    assert (a.n_buckets_capped, a.n_dropped_memberships) == (0, 0)
    # cap = 3 binds in the 5-occupancy bucket: only the first 3 by
    # (s_us, e_us, iid) — iids 0,1,2 — pair; 2 memberships dropped
    pairs3, audit3 = api.interval_overlap_self_join_capped(
        ivs, bucket_us=H, cap=3, tie_cols=("iid",))
    got = pairset(pairs3)
    assert got == {p for p in exact if p[0] <= 2 and p[1] <= 2}
    a3 = audit3.collect()[0]
    assert (a3.n_buckets_capped, a3.n_dropped_memberships) == (1, 2)


def test_q_join_interval_overlap_capped_matches_exact_below_cap(spark):
    """At sf0.001 per-hour occupancy maxes at 6 < cap=20, so the
    registered capped query must equal the exact query exactly (plus
    the all-zero audit columns) — the 'results ≡ the exact form below
    the cap' half of the fuse contract."""
    from zio_kinesis_example_spark.operators.pipeline_ext2 import (
        q_join_interval_overlap, q_join_interval_overlap_capped,
    )

    from .conftest import SF_SMALL

    exact = {(r.user_a, r.user_b): (r.n_overlaps, r.overlap_us)
             for r in q_join_interval_overlap(spark, SF_SMALL).collect()}
    capped_rows = q_join_interval_overlap_capped(spark, SF_SMALL).collect()
    capped = {(r.user_a, r.user_b): (r.n_overlaps, r.overlap_us)
              for r in capped_rows}
    assert capped == exact
    assert all((r.n_buckets_capped, r.n_dropped_memberships) == (0, 0)
               for r in capped_rows)


def test_holt_smooth_generic(spark):
    # a perfectly linear series: level tracks, trend converges to slope
    rows = [("a", i, 10.0 + 2.0 * i) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, i int, x double")
    out = {r.k: r for r in api.holt_smooth(df, ["k"], "i", "x").collect()}
    r = out["a"]
    assert r.n_points == 50
    # slope recovered up to the decaying residue of the inexact binary
    # 0.4/0.6 coefficients
    assert abs(r.trend - 2.0) < 1e-4
    assert abs(r.forecast_next - (10.0 + 2.0 * 50)) < 1e-3
    # short series are dropped
    short = spark.createDataFrame([("b", 1, 5.0)], "k string, i int, x double")
    assert api.holt_smooth(short, ["k"], "i", "x").count() == 0


def test_cusum_changepoint_generic(spark):
    # level shift at position 11: 10 points of 5/h then 10 points of 50/h
    rows = [("a", i, 5) for i in range(10)] + \
           [("a", 10 + i, 50) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, i int, n long")
    out = {r.k: r for r in
           api.cusum_changepoint(df, ["k"], "i", "n").collect()}
    r = out["a"]
    assert r.cp_at == 9          # cumulative deviation peaks at the last low point
    assert r.n_points == 20 and r.total == 550
    # dev at i=10: |20*50 - 10*550| = 4500
    assert r.dev_scaled == 4500


def test_cooccurrence_pairs_cap_bounds_hub_groups(spark):
    """max_items_per_group slices each group's SORTED item set before the
    pair fan-out: a hub group with many items contributes at most
    cap*(cap-1)/2 pairs, over its lexicographically-first cap items
    (deterministic), while small groups are unaffected."""
    rows = [("hub", f"i{k:02d}") for k in range(10)] + \
           [("s", "a"), ("s", "b")]
    df = spark.createDataFrame(rows, "g string, item string")

    full = api.cooccurrence_pairs(df, "g", "item").collect()
    assert len(full) == 45 + 1          # C(10,2) + C(2,2)

    capped = api.cooccurrence_pairs(
        df, "g", "item", max_items_per_group=4).collect()
    pairs = {(r.item_a, r.item_b) for r in capped}
    hub_pairs = {p for p in pairs if p[0].startswith("i")}
    assert len(hub_pairs) == 6          # C(4,2)
    # kept subset = first 4 sorted items
    assert hub_pairs == {(a, b)
                         for i, a in enumerate([f"i{k:02d}" for k in range(4)])
                         for b in [f"i{k:02d}" for k in range(4)][i + 1:]}
    assert ("a", "b") in pairs          # small group untouched


def test_merge_upsert_delta_wins_whole_row(spark):
    """A matched delta row replaces the base row WHOLE-ROW (SQL MERGE
    'UPDATE SET *'): a field intentionally set to NULL must not
    resurrect the stale base value, and NULL keys merge as one group
    (code-review r5 findings)."""
    base = spark.createDataFrame(
        [(1, "a", "x"), (None, "n0", "y")], "k int, v string, w string")
    delta = spark.createDataFrame(
        [(1, None, "x2"), (None, "n1", None)], "k int, v string, w string")
    rows = {r.k: (r.v, r.w)
            for r in api.merge_upsert(base, delta, "k").collect()}
    assert rows[1] == (None, "x2")        # NULL field kept, not coalesced
    assert rows[None] == ("n1", None)     # one NULL-key row, delta wins
    assert len(rows) == 2


def test_salted_join_negative_and_null_salt(spark):
    """pmod + NULL fallback: a hash-valued (often negative) or NULL salt
    must never drop fact rows — the docstring promises semantic
    equivalence with the plain join (code-review r5 finding)."""
    fact = spark.createDataFrame(
        [(i, i % 3) for i in range(60)], "fid long, k long")
    dim = spark.createDataFrame(
        [(0, "x"), (1, "y"), (2, "z")], "dk long, name string")
    plain = sorted((r.fid, r.name)
                   for r in fact.join(dim, fact.k == dim.dk).collect())
    hashed = api.salted_join(fact, dim, "k", "dk",
                             salt_col=F.hash(F.col("fid")), n_buckets=8)
    assert sorted((r.fid, r.name) for r in hashed.collect()) == plain
    nulled = api.salted_join(
        fact, dim, "k", "dk",
        salt_col=F.when(F.col("fid") % 2 == 0, F.col("fid")), n_buckets=8)
    assert sorted((r.fid, r.name) for r in nulled.collect()) == plain


def test_temperature_sample_and_kmeans_large_ids(spark):
    """Snowflake-scale ids must not overflow the rank hash under ANSI
    mode (the old (id * knuth) % 2^32 multiply threw
    ARITHMETIC_OVERFLOW above ~3.47e9)."""
    big = 4_000_000_000_000_000_000
    df = spark.createDataFrame(
        [(big + i, "g", [float(i), 1.0]) for i in range(10)],
        "id long, g string, vec array<double>")
    out = api.temperature_sample(df, "g", "id", budget=5)
    assert out.count() == 5
    fitted = api.kmeans_fit(df, "vec", "id", k=2, iters=1)
    assert fitted.select("cluster_id").distinct().count() <= 2


def test_kmeans_fit_clear_errors(spark):
    import pytest

    df = spark.createDataFrame([(1, [1.0])], "id long, vec array<double>")
    with pytest.raises(ValueError, match="exceeds"):
        api.kmeans_fit(df, "vec", "id", k=5)
    empty = df.filter("id < 0")
    with pytest.raises(ValueError, match="empty"):
        api.kmeans_fit(empty, "vec", "id", k=1)


def test_asof_join_ties_deterministic(spark):
    """Two right rows at the identical timestamp: the match must be the
    same on every run/partitioning (greatest payload wins), not
    shuffle-order-dependent (code-review r5 finding)."""
    left = spark.createDataFrame([("A", _ts(10))], "k string, t timestamp")
    right = spark.createDataFrame(
        [("A", _ts(5), 9.9), ("A", _ts(5), 10.1)],
        "k string, rt timestamp, px double")
    for _ in range(3):
        out = api.asof_join(left.repartition(4), right.repartition(3),
                            key="k", left_ts="t", right_ts="rt",
                            right_cols=["px"]).collect()
        assert [r.asof_px for r in out] == [10.1]


def test_zorder_key_signed_inputs(spark):
    """Negative coordinates must interleave into non-negative z-values
    with locality preserved inside the aligned window (the sign-
    preserving % used to emit negative, non-interleaved keys)."""
    df = spark.createDataFrame(
        [(-3, -3), (-3, -2), (-2, -3), (100, 100)], "a long, b long")
    out = api.zorder_key(df, "a", "b", bits=16).collect()
    zs = {(r.a, r.b): r.zval for r in out}
    assert all(z >= 0 for z in zs.values())
    # neighbors in the same aligned window stay close; the far point isn't
    near = [zs[(-3, -3)], zs[(-3, -2)], zs[(-2, -3)]]
    assert max(near) - min(near) <= 8


def test_holt_smooth_nonlinear_and_two_point(spark):
    """The textbook init (l1=x1, b1=x2-x1) on a NON-linear series — the
    old x2/x3 init canceled exactly on linear data, hiding the bug —
    and the 2-point series that used to throw INVALID_ARRAY_INDEX."""
    rows = [("a", i, x) for i, x in enumerate([1.0, 10.0, 2.0, 8.0])]
    out = {r.k: r for r in api.holt_smooth(
        spark.createDataFrame(rows, "k string, i int, x double"),
        ["k"], "i", "x").collect()}
    assert abs(out["a"].level - 14.696) < 1e-9
    assert abs(out["a"].trend - 5.6208) < 1e-9
    two = spark.createDataFrame([("b", 0, 3.0), ("b", 1, 7.0)],
                                "k string, i int, x double")
    r = api.holt_smooth(two, ["k"], "i", "x").collect()[0]
    # l1=3, b1=4; then fold x2=7: l=.4*7+.6*7=7, b=.3*4+.7*4=4
    assert (r.level, r.trend) == (7.0, 4.0)


def test_asof_join_excludes_null_right_ts(spark):
    """A right row with NULL ts must never match (NULL is not 'less
    than' anything) — the r8 review fix: ascending NULLS FIRST ordering
    previously parked it inside every left row's preceding frame."""
    trades = spark.createDataFrame(
        [("A", 10, 1)], ["sym", "t", "trade_id"])
    quotes = spark.createDataFrame(
        [("A", None, 999.0), ("A", 5, 1.5)], ["sym", "t", "px"])
    out = api.asof_join(trades, quotes, key="sym",
                        left_ts="t", right_ts="t", right_cols=["px"])
    assert out.collect()[0].asof_px == 1.5
    # with ONLY the NULL-ts quote present there is no match at all
    only_null = quotes.filter(F.col("t").isNull())
    out2 = api.asof_join(trades, only_null, key="sym",
                         left_ts="t", right_ts="t", right_cols=["px"])
    assert out2.collect()[0].asof_px is None


def test_dedup_exact_excludes_null_text(spark):
    """NULL payloads must not fold into one sha2(NULL) group declaring
    unrelated rows copies of each other (r8 review fix)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None), (5, None)],
        ["id", "text"])
    out = api.dedup_exact(df, "text", "id").collect()
    assert len(out) == 1 and out[0].n_copies == 2


def test_containment_pairs_ignores_contentless_docs(spark):
    """NULL/empty texts share no real n-grams; they must not pair
    quadratically via the '' shingle (r8 review fix)."""
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, ""), (4, ""), (5, None)],
        ["pid", "body"])
    pairs = {(r.id_a, r.id_b) for r in
             api.containment_pairs(df, "body", "pid").collect()}
    assert pairs == {(1, 2)}


def test_scale_proxy_builder_properties(tmpdir_factory_local):
    """tools/scale_proxy.build_proxy (r10, now in-repo): the rolled-copy
    corpus must preserve row count x copies, keep vec_ids disjoint
    across copies, preserve every vector's norm (np.roll is a
    permutation), and write one file per copy (the multi-file layout
    whose absence serialized the first r10 measurement attempt)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from zio_kinesis_example_spark.tools.scale_proxy import build_proxy

    src = "/root/testdata/sf0.001/embeddings.parquet"
    out = build_proxy(tmpdir_factory_local("proxy-test"), 3, src=src)
    dest = os.path.join(out, "embeddings.parquet")
    assert len([f for f in os.listdir(dest)
                if f.endswith(".parquet")]) == 3
    t0 = pq.read_table(src)
    t = pq.read_table(dest)
    n = t0.num_rows
    assert t.num_rows == 3 * n
    ids = np.asarray(t.column("vec_id").to_pylist())
    assert len(set(ids)) == 3 * n                      # disjoint ids
    v0 = np.stack(t0.column("embedding").to_pylist()).astype(np.float64)
    v = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    v = v[order]
    norms0 = np.sqrt((v0 ** 2).sum(axis=1))
    for k in range(3):
        blk = v[k * n:(k + 1) * n]
        assert np.allclose(np.sqrt((blk ** 2).sum(axis=1)), norms0)
        # copy k is the roll by 7k (mod dim) of the originals
        assert np.array_equal(blk, np.roll(v0, (7 * k) % v0.shape[1],
                                           axis=1))
    # idempotent: a second call returns without rewriting
    assert build_proxy(out, 3, src=src) == out
