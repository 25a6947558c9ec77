"""Skew-stress proxy (r13): the SEVENTH adversarial axis — and the
first PERFORMANCE axis. Every earlier axis stressed VALUES (nulls,
content, clocks); every SCALE proxy kept keys uniform by construction
("No AQE skew split fired at any scale — the proxy is skew-free by
construction", BASELINE.md r11). A real 100 TB lake is Zipfian in
users, terms, and hours, so the skew remedies this repo ships —
`q_join_skew_salted`'s explicit salt, the AQE skew-join config in
session.py, `q_join_interval_overlap_capped`'s flash-crowd fuse — had
never met an actual hot key. This tool builds Zipfian-rekeyed proxies
and runs BOTH contracts over them:

value parity (``--sweep``, the q21 method applied to skew)
    Results must be key-distribution-invariant: the full registry runs
    Spark-vs-DuckDB over the SAME skewed parquet, so every hash
    mismatch is a genuine semantics divergence that uniform fixtures
    masked (giant-group tie-breaks, per-group width assumptions,
    single-member-group edge paths).

plan/wall behavior (``--perf``)
    On skewed rolled-copy proxies at 10x/30x of sf0.1, measure the
    heavy join + window families under the bench cold contract and
    digest the FINAL adaptive plans; additionally run the salted join
    against its unsalted twin in three regimes (broadcast-allowed /
    SMJ-forced with AQE skew split / SMJ-forced without) and the
    exact-vs-capped interval overlap against a flash-crowd hour.

Skew classes injected (all DETERMINISTIC — the Knuth-hash recipe of
null_stress; manifest-guarded rebuilds):

  events.user_id    FULL Zipf(s) rekey over the observed user domain:
                    at s=1.2 the hottest user owns ~18% of events, at
                    s=2.0 ~60% — the hot-user join/window/session key.
  orders.o_custkey  FULL Zipf(s) rekey over the observed custkey
                    domain (hot customer in orders->customer joins,
                    q13's count distribution).
  lineitem.l_partkey FULL Zipf(s) rekey over the observed part domain
                    (hot part through q9/q14/q17/q19-class joins).
  lineitem.l_orderkey PARTIAL rekey (100 permille): 10% of lines are
                    re-pointed at Zipf-drawn orders — mega-orders for
                    the q18-class groupBy and orders||lineitem joins —
                    while 90% keep the generator's order-line shape.
  events.ts         FLASH-CROWD hour: flash_permille of events are
                    remapped into ONE hot hour (sub-hour offset
                    preserved), the bucket-occupancy stress for the
                    interval-overlap pair and hourly rollups.

Rank->key assignment is hash-PERMUTED so hotness is uncorrelated with
key magnitude (several queries derive values from key arithmetic; a
"key 1 is always hot" proxy would correlate skew with those domains).
Referential integrity holds by construction: every rekeyed value is
drawn from the column's own observed (or rolled-shifted) domain.

Reference anchor: shard-level skew is the ONE physical concern the
reference delegates to KCL lease balancing (log_output "took 32
leases", SURVEY §4); a Spark engine must handle key skew itself —
measured, not configured.

Run (value parity, sf0.01 gate):
    python -m zio_kinesis_example_spark.tools.skew_stress \
        [--src /root/testdata/sf0.01] [--s 1.2] [--flash-permille 50] \
        [--queries a,b] [--build-only]
Run (perf contract, rolled copies of sf0.1):
    python -m zio_kinesis_example_spark.tools.skew_stress --perf \
        --copies 10 --s 2.0 [--flash-permille 20] >> skewscale.jsonl
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"

_KNUTH = np.uint64(2654435761)

#: tables copied untouched (parity build; the perf build also rolls
#: the relational tables exactly like tools/relational_scale.py).
_FIXED = ("nation", "region", "customer", "supplier", "part",
          "documents", "embeddings")

_HOUR_US = 3_600_000_000
#: the flash-crowd hour sits this many hours past the corpus's first
#: event — inside the generator's time domain at every SF, so hourly
#: rollup/gapfill spines are stressed, not inflated.
_FLASH_HOUR_OFFSET = 240

#: partial-rekey rate for l_orderkey (permille): mega-orders emerge
#: while most order-line structure survives.
_ORDERKEY_PERMILLE = 100


def _hash_u64(n: int, tag: str) -> np.ndarray:
    seed = np.uint64(zlib.crc32(tag.encode()))
    idx = np.arange(n, dtype=np.uint64)
    h = (idx + np.uint64(1)) * _KNUTH + seed * np.uint64(0x9E3779B9)
    h ^= h >> np.uint64(16)
    h *= _KNUTH
    h ^= h >> np.uint64(13)
    return h


def _hash01(n: int, tag: str) -> np.ndarray:
    """Deterministic uniform [0,1) per row index (53-bit mantissa)."""
    return (_hash_u64(n, tag) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53)


def _mask(n: int, tag: str, permille: int) -> np.ndarray:
    return (_hash_u64(n, tag) % np.uint64(1000)) < np.uint64(permille)


def zipf_rekey(vals: np.ndarray, domain: np.ndarray, s: float, tag: str,
               permille: int = 1000) -> np.ndarray:
    """Zipf(s)-distributed draw over ``domain`` per row; rows outside
    the permille selection keep their original value. Rank r (1-based)
    carries weight r^-s; the rank->key map is hash-permuted."""
    k = len(domain)
    w = np.arange(1, k + 1, dtype=np.float64) ** -s
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    u = _hash01(len(vals), tag + ".u")
    ranks = np.searchsorted(cdf, u, side="right").clip(0, k - 1)
    perm = np.argsort(_hash_u64(k, tag + ".perm"), kind="stable")
    out = domain[perm[ranks]]
    if permille < 1000:
        sel = _mask(len(vals), tag + ".sel", permille)
        out = np.where(sel, out, vals)
    return out.astype(vals.dtype, copy=False)


def _flash_crowd_ts(ticks: np.ndarray, ticks_per_hour: int, tag: str,
                    permille: int) -> np.ndarray:
    """Remap ``permille`` of int64-tick timestamps into one hot hour
    (min-ts + _FLASH_HOUR_OFFSET hours — inside the generator's
    ~720-hour event month), preserving each row's sub-hour offset so
    intra-hour order still varies. ``ticks_per_hour`` comes from the
    column's arrow unit (us in the driver fixtures; ns-typed variants
    exist in the wild, catalog.load handles both)."""
    if permille <= 0 or len(ticks) == 0:
        return ticks
    hot_start = (ticks.min() // ticks_per_hour
                 + _FLASH_HOUR_OFFSET) * ticks_per_hour
    sel = _mask(len(ticks), tag, permille)
    return np.where(sel, hot_start + ticks % ticks_per_hour, ticks)


#: rolled-copy key offsets, shared with tools/relational_scale.py's
#: +1-decorrelated domains (the r11 offset correction).
_DOMAINS = {"orderkey": 150_001, "custkey": 15_001, "partkey": 20_001,
            "suppkey": 1_001, "eventid": 100_001}
_SHIFTS: dict[str, dict[str, str]] = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "custkey"},
}


def _scaled_domain(uniq_1x: np.ndarray, offset: int,
                   copies: int) -> np.ndarray:
    """The GLOBAL key domain of a rolled proxy: the 1x uniques shifted
    per copy — Zipf hotness is then global (one hot key in the whole
    lake), not per-island, which is what a Zipfian lake looks like."""
    if copies <= 1:
        return uniq_1x
    return np.concatenate([uniq_1x + k * offset for k in range(copies)])


def build_skew_proxy(out_dir: str, src: str = SRC, copies: int = 1,
                     s: float = 1.2, flash_permille: int = 50) -> str:
    """Write the skewed proxy: rolled copies (perf) or 1x (parity) of
    the relational tables with the five skew classes applied. Manifest
    guard per relational_scale: dest reused only when source, copies,
    s, flash rate, and offsets all match."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"src": src, "copies": copies, "s": s,
            "flash_permille": flash_permille, "domains": _DOMAINS,
            "orderkey_permille": _ORDERKEY_PERMILLE, "v": 1}
    try:
        with open(manifest) as fh:
            if json.load(fh) == want:
                return out_dir
    except (OSError, ValueError):
        pass
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)

    for name in _FIXED:
        src_p = os.path.join(src, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if copies <= 1 or name not in _SHIFTS:
            shutil.copyfile(src_p, dst)
            continue

    # rolled copies of the shifted dims (perf build): same layout as
    # relational_scale — one part file per copy
    def _write_parts(name: str, transform):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        dest = os.path.join(out_dir, f"{name}.parquet")
        if copies > 1:
            if os.path.exists(dest):
                os.remove(dest)
            os.makedirs(dest, exist_ok=True)
        for k in range(copies):
            cols = {}
            for field in t.schema:
                col = t.column(field.name).combine_chunks()
                if k and field.name in _SHIFTS.get(name, {}):
                    off = k * _DOMAINS[_SHIFTS[name][field.name]]
                    col = pc.add(col, pa.scalar(off, type=field.type))
                cols[field.name] = col
            cols = transform(k, cols, t.schema)
            out = pa.table(cols, schema=t.schema)
            if copies > 1:
                pq.write_table(out, os.path.join(dest, f"part-{k:05d}.parquet"))
            else:
                pq.write_table(out, dest)

    # key domains come from the 1x uniques (+ per-copy shifts)
    ev1 = pq.read_table(os.path.join(src, "events.parquet"),
                        columns=["user_id"])
    u_users = _scaled_domain(
        np.unique(ev1.column("user_id").to_numpy()),
        _DOMAINS["custkey"], copies)
    o1 = pq.read_table(os.path.join(src, "orders.parquet"),
                       columns=["o_custkey", "o_orderkey"])
    u_cust = _scaled_domain(
        np.unique(o1.column("o_custkey").to_numpy()),
        _DOMAINS["custkey"], copies)
    u_orders = _scaled_domain(
        np.unique(o1.column("o_orderkey").to_numpy()),
        _DOMAINS["orderkey"], copies)
    li1 = pq.read_table(os.path.join(src, "lineitem.parquet"),
                        columns=["l_partkey"])
    u_parts = _scaled_domain(
        np.unique(li1.column("l_partkey").to_numpy()),
        _DOMAINS["partkey"], copies)

    def tr_events(k, cols, schema):
        uid = cols["user_id"].to_numpy()
        cols["user_id"] = pa.array(
            zipf_rekey(uid, u_users, s, f"events.user_id.{k}"),
            type=schema.field("user_id").type)
        f = schema.field("ts")
        unit = getattr(f.type, "unit", "us")
        tph = {"s": 3_600, "ms": 3_600_000, "us": 3_600_000_000,
               "ns": 3_600_000_000_000}[unit]
        ticks = cols["ts"].cast(pa.int64()).to_numpy()
        cols["ts"] = pa.array(
            _flash_crowd_ts(ticks, tph, f"events.ts.{k}", flash_permille)
        ).cast(f.type)
        return cols

    def tr_orders(k, cols, schema):
        ck = cols["o_custkey"].to_numpy()
        cols["o_custkey"] = pa.array(
            zipf_rekey(ck, u_cust, s, f"orders.o_custkey.{k}"),
            type=schema.field("o_custkey").type)
        return cols

    def tr_lineitem(k, cols, schema):
        pk = cols["l_partkey"].to_numpy()
        cols["l_partkey"] = pa.array(
            zipf_rekey(pk, u_parts, s, f"lineitem.l_partkey.{k}"),
            type=schema.field("l_partkey").type)
        ok = cols["l_orderkey"].to_numpy()
        cols["l_orderkey"] = pa.array(
            zipf_rekey(ok, u_orders, s, f"lineitem.l_orderkey.{k}",
                       permille=_ORDERKEY_PERMILLE),
            type=schema.field("l_orderkey").type)
        return cols

    ident = lambda k, cols, schema: cols  # noqa: E731
    _write_parts("events", tr_events)
    _write_parts("orders", tr_orders)
    _write_parts("lineitem", tr_lineitem)
    if copies > 1:
        # the shifted dims were skipped by the _FIXED copy above and
        # roll here instead (keys shift, values untouched)
        for name in ("customer", "part", "supplier"):
            _write_parts(name, ident)

    tmp = f"{manifest}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(want, fh)
    os.replace(tmp, manifest)          # written LAST: a killed build
    return out_dir                     # re-reads as a mismatch


# --------------------------------------------------------------------------
# perf contract
# --------------------------------------------------------------------------

#: the measured surface for --perf: the queries whose plans/walls skew
#: can actually bend — heavy joins, giant-group aggs, the window
#: family's per-key partitions, and the interval-overlap pair.
PERF_QUERIES = [
    "q_join_skew_salted", "q_join_3way", "q_join_broadcast",
    "q_join_bloom_semi", "q_tpch_q9", "q_tpch_q13", "q_tpch_q17",
    "q_tpch_q18", "q_win_rank", "q_win_frame", "q_win_session_batch",
    "q_events_session_stats", "q_join_interval_overlap",
    "q_join_interval_overlap_capped",
]

#: SMJ-forced regime: emulates the 100 TB shape where the dim side
#: exceeds any broadcast budget and a skewed shuffle partition exceeds
#: the 256 MB skew threshold. At proxy scale (tens of MB) the DEFAULT
#: thresholds can't bind by arithmetic — a 10x proxy's hottest
#: partition is ~30 MB — so the thresholds scale DOWN by the same
#: ~1000x that separates the proxy from the target, exactly like
#: shuffle.partitions scales up on a real cluster. Values are restored
#: after each regime run.
SMJ_REGIME = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
}
NO_SKEWJOIN = {"spark.sql.adaptive.skewJoin.enabled": "false"}


def _salted_twin_plans(spark, sf_dir: str):
    """(salted, unsalted) frames computing the SAME aggregate —
    operators.advanced.q_join_skew_salted and its plain-join twin (the
    salted query's own oracle SQL, as a DataFrame plan)."""
    from pyspark.sql import functions as F

    from ..catalog import load
    from ..operators.advanced import q_join_skew_salted
    from ..operators.exact import cents_sum

    def unsalted(spark, sf_dir):
        e = load(spark, sf_dir, "events")
        c = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment")
        return (e.join(c, e.user_id == c.c_custkey)
                .groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     cents_sum("value").alias("sum_value")))

    return q_join_skew_salted, unsalted


def _timed(spark, fn, sf_dir: str, runs: int = 2):
    import time

    from ..api import clear_shared_cache

    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
        clear_shared_cache()
    df = fn(spark, sf_dir)
    qe = df._jdf.queryExecution()
    rows = qe.executedPlan().execute().count()
    plan = qe.executedPlan().toString()
    spark.catalog.clearCache()
    clear_shared_cache()
    from .relational_scale import plan_digest
    return {"wall": walls, "rows": int(rows), "plan": plan_digest(plan)}


def _with_confs(spark, confs: dict):
    """Context manager: set runtime confs, restore previous values."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        old = {}
        for k, v in confs.items():
            try:
                old[k] = spark.conf.get(k)
            except Exception:
                old[k] = None
            spark.conf.set(k, v)
        try:
            yield
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    return cm()


def perf_main(out_dir: str, src: str, copies: int, s: float,
              flash_permille: int, queries: list[str] | None) -> None:
    """Emit one JSON line per (query, regime) measurement — digestible
    with relational_scale-style tooling; the salted/unsalted triple and
    the overlap pair are measured explicitly."""
    build_skew_proxy(out_dir, src=src, copies=copies, s=s,
                     flash_permille=flash_permille)
    print(json.dumps({"proxy": out_dir, "copies": copies, "s": s,
                      "flash_permille": flash_permille}), flush=True)

    from ..registry import all_specs
    from ..session import get_spark

    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in (queries or PERF_QUERIES):
        spec = specs[name]
        fn = spec.bench_fn or spec.fn
        rec = {"query": name, "dir": out_dir, "regime": "default",
               **_timed(spark, fn, out_dir)}
        print(json.dumps(rec), flush=True)

    # the salted-vs-unsalted triple on the REAL hot key
    salted, unsalted = _salted_twin_plans(spark, out_dir)
    for regime, confs in (
            ("broadcast", {}),
            ("smj_aqe_skew", SMJ_REGIME),
            ("smj_no_skew", {**SMJ_REGIME, **NO_SKEWJOIN})):
        with _with_confs(spark, confs):
            for label, fn in (("salted", salted), ("unsalted", unsalted)):
                rec = {"query": f"skew_twin_{label}", "dir": out_dir,
                       "regime": regime, **_timed(spark, fn, out_dir)}
                print(json.dumps(rec), flush=True)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--s", type=float, default=1.2)
    ap.add_argument("--flash-permille", type=int, default=50)
    ap.add_argument("--copies", type=int, default=1)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--perf", action="store_true")
    args = ap.parse_args()
    src = args.src or ("/root/testdata/sf0.1" if args.perf else SRC)
    tagn = str(args.s).replace(".", "")
    out = args.out or (
        f"/tmp/skewstress_{os.path.basename(src.rstrip('/')).replace('.', '')}"
        f"_s{tagn}_f{args.flash_permille}"
        + (f"_{args.copies}x" if args.copies > 1 else ""))
    names = args.queries.split(",") if args.queries else None

    if args.perf:
        perf_main(out, src, args.copies, args.s, args.flash_permille, names)
        return

    build_skew_proxy(out, src=src, copies=args.copies, s=args.s,
                     flash_permille=args.flash_permille)
    print(f"proxy ready: {out}", flush=True)
    if args.build_only:
        return

    from ..session import get_spark
    from .oracle import compare_all

    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    res = compare_all(spark, out, names=names)
    bad = [r for r in res if not r.ok]
    for r in res:
        print(("OK  " if r.ok else "FAIL") + f" {r.name}"
              + ("" if r.ok else f"  {r.detail[:300]}"), flush=True)
    print(f"checked {len(res)}, failures {len(bad)}")
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
