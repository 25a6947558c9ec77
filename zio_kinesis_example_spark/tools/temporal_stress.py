"""Temporal-extremes stress proxy (r12): the SIXTH adversarial
value-parity axis — the clock values a real 100 TB lake WILL contain
and the generator-faithful fixtures never do (every fixture ts lives
in 2024, every date in the TPC-H 1992-1998 window).

events.ts classes (timestamp[us]; one class per stressed row):

  0  epoch zero          1970-01-01 00:00:00.000000 — THE canonical
                         default-value corruption (unset clocks,
                         zeroed fields).
  1  pre-epoch, fractional  1969-12-31 23:59:59.500000 — NEGATIVE
                         epoch with sub-second part: floor(epoch(ts))
                         floors toward −∞ (→ −1) while
                         truncate-toward-zero second arithmetic
                         (timestampdiff, integer DIV) gives 0. Any
                         formulation pairing one of each diverges on
                         exactly these rows and nowhere else.
  2  deep pre-epoch      1969-07-20 02:56:08.123456.
  3  2038 rollover       2038-01-19 03:14:08.000001 — first second
                         past signed-int32 epoch; the classic bad
                         upstream-clock artifact.
  4  far future          2106-02-07 06:28:16.999999 (past unsigned
                         int32): also measures the UNBOUNDED-FAN-OUT
                         class — a min→max hourly spine (gapfill /
                         interpolate) inflates from ~1 week to ~1.2 M
                         hours off ONE poison row; the sweep must
                         still hash-match, and the wall cost is the
                         honest price of an unclamped spine.
  5  sub-second boundary 2024-06-01 00:00:00.999999 — in-domain date,
                         .999999 micros: rounding/bucketing edges.

date classes (orders.o_orderdate, lineitem.l_shipdate; date32):

  0  1970-01-01          epoch default.
  1  9998-01-01          far sentinel (the "no end date" anti-pattern).
                         Deliberately NOT 9999-12-31: the registry's
                         legal date arithmetic (+90 days, +n months)
                         would push results past year 9999 — which
                         BOTH engines compute fine (micros-int64 spans
                         ±290k years) but Python's datetime (year
                         1..9999) cannot hold, so neither the oracle
                         harness nor the DRIVER could collect the
                         result. The python range is a harness bound,
                         not an engine bound; sentinels here survive
                         ±4 years of arithmetic.
  2  0005-01-01          proleptic-Gregorian floor (same ±4y margin —
                         year-0 is unrepresentable in python).
  3  1582-10-05          inside the historical Julian→Gregorian
                         cutover gap — a real date only in the
                         proleptic calendar BOTH engines use (Spark 3+
                         and DuckDB are proleptic; a divergence here
                         means one side re-grew hybrid-calendar
                         behavior).

Masks/classes are DETERMINISTIC (null_stress's Knuth hash recipe);
manifest-guarded rebuilds. Both engines read the SAME parquet, so any
mismatch is a genuine semantics divergence.

Reference anchor: the reference's approximate-set-time checks tolerate
clock skew explicitly (TestUtils.scala assertion windows); skewed and
default-valued clocks are the batch analogue (SURVEY §1.1 row 7).

Run:    python -m zio_kinesis_example_spark.tools.temporal_stress \
            [--src /root/testdata/sf0.01] [--out /tmp/temporalstress_sf001] \
            [--queries a,b] [--build-only] [--rate-scale N]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"

_KNUTH = np.uint64(2654435761)

FIXED = ("region", "nation", "customer", "supplier", "part",
         "documents", "embeddings")

TS_CLASSES = 6
TS_PERMILLE = 10      # per class, scale 1 → 6 % of events stressed
DATE_CLASSES = 4
DATE_PERMILLE = 8     # per class per column

_EPOCH = dt.datetime(1970, 1, 1)

TS_VALUES = [
    dt.datetime(1970, 1, 1, 0, 0, 0, 0),
    dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
    dt.datetime(1969, 7, 20, 2, 56, 8, 123456),
    dt.datetime(2038, 1, 19, 3, 14, 8, 1),
    dt.datetime(2106, 2, 7, 6, 28, 16, 999999),
    dt.datetime(2024, 6, 1, 0, 0, 0, 999999),
]
DATE_VALUES = [
    dt.date(1970, 1, 1),
    dt.date(9998, 1, 1),
    dt.date(5, 1, 1),
    dt.date(1582, 10, 5),
]


def _bucket(n: int, table: str, column: str) -> np.ndarray:
    seed = np.uint64(zlib.crc32(f"{table}.{column}.temporal".encode()))
    idx = np.arange(n, dtype=np.uint64)
    h = (idx + np.uint64(1)) * _KNUTH + seed * np.uint64(0x9E3779B9)
    h ^= h >> np.uint64(16)
    h *= _KNUTH
    h ^= h >> np.uint64(13)
    return (h % np.uint64(1000)).astype(np.int64)


def build_temporal_proxy(out_dir: str, src: str = SRC,
                         rate_scale: int = 1) -> str:
    ts_pm = min(TS_PERMILLE * rate_scale, 500 // TS_CLASSES)
    date_pm = min(DATE_PERMILLE * rate_scale, 500 // DATE_CLASSES)
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"src": src, "ts_pm": ts_pm, "date_pm": date_pm,
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

    # --- events.ts -----------------------------------------------------
    t = pq.read_table(os.path.join(src, "events.parquet"))
    n = t.num_rows
    b = _bucket(n, "events", "ts")
    cls = b // ts_pm
    stressed = b < ts_pm * TS_CLASSES
    ts = t.column("ts").to_pylist()
    for i in np.flatnonzero(stressed):
        ts[i] = TS_VALUES[int(cls[i])]
    cols = []
    for field in t.schema:
        if field.name == "ts":
            cols.append(pa.array(ts, type=field.type))
        else:
            cols.append(t.column(field.name).combine_chunks())
    pq.write_table(pa.Table.from_arrays(cols, schema=t.schema),
                   os.path.join(out_dir, "events.parquet"))

    # --- date columns ----------------------------------------------------
    for name, col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        n = t.num_rows
        b = _bucket(n, name, col)
        cls = b // date_pm
        stressed = b < date_pm * DATE_CLASSES
        vals = t.column(col).to_pylist()
        # the fixture stores dates as timestamp[us] midnights — keep that
        for i in np.flatnonzero(stressed):
            d = DATE_VALUES[int(cls[i])]
            vals[i] = dt.datetime(d.year, d.month, d.day)
        cols = []
        for field in t.schema:
            if field.name == col:
                cols.append(pa.array(vals, type=field.type))
            else:
                cols.append(t.column(field.name).combine_chunks())
        pq.write_table(pa.Table.from_arrays(cols, schema=t.schema),
                       os.path.join(out_dir, f"{name}.parquet"))

    tmp = f"{manifest}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(want, fh)
    os.replace(tmp, manifest)          # written LAST (killed-build guard)
    return out_dir


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--rate-scale", type=int, default=1)
    args = ap.parse_args()
    out = args.out or ("/tmp/temporalstress_" + os.path.basename(
        args.src.rstrip("/")).replace(".", "")
        + (f"_x{args.rate_scale}" if args.rate_scale != 1 else ""))
    build_temporal_proxy(out, src=args.src, rate_scale=args.rate_scale)
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
