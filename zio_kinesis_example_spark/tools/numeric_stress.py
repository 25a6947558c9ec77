"""Numeric-extremes stress proxy (r13): the EIGHTH adversarial
value-parity axis — measure-column edge values a real 100 TB lake WILL
contain and the generator-faithful fixtures never do (every price is a
benign 2dp positive, every quantity 1..50, every events.value a small
finite double). The r6/r9 width rules (ppm wraps, 2·rn wraps, decimal
re-rounding past 38) were found by INSPECTION; this axis finds the
remainder by SWEEP — the q21 method on the numeric domain.

money-double classes (l_extendedprice, o_totalprice, c_acctbal,
s_acctbal, p_retailprice; one class per stressed row):

  0  0.0                 zero money (empty-group / division guards).
  1  -0.0                the sign-bit class: round(-0.0) prints -0.0
                         in one engine and 0.0 in the other wherever a
                         +0.0 guard is missing.
  2  -99999.99           negative money (refunds/chargebacks) —
                         breaks every "money is positive" assumption
                         (ABC cuts, abs-free rankings, sqrt paths).
  3  99999999999999.984375  PAST the double-exactness edge (> 2^53/10^4):
                         fits DECIMAL(18,4) numerically, but the
                         double→decimal CONVERSION is engine-defined
                         here — measured: DuckDB float-scales to .9872,
                         Spark shortest-reprs to .9800. The class that
                         forced MEASURE_ABS_MAX down to 9.0e11; must
                         cost its own cell behind every guard.
  3b 899999999999.9844   the IN-domain precision edge (< 2^53/10^4):
                         v·10^4 is an exact integer, so both engines
                         convert identically; must hash-match through
                         every decimal path.
  4  0.004999            sub-cent: rounds to 0 cents — the
                         0 < x < 0.005 DIV-guard class (r6 rule, now
                         swept instead of inspected).
  5  123.456789          >2dp money: the "2dp by construction"
                         assumption behind int64-cents emission.

l_quantity classes: 0.0 / -5.0 / 0.5 (fractional) / 2147483647.0
(int32 boundary as double) / 1e15 (breaks any decimal(18,4) cast and
any qty-as-int assumption).

l_discount / l_tax classes: -0.25 / 1.5 / 0.999999 — discounts outside
[0,1] make revenue NEGATIVE through the exact money_term chain.

events.value classes (the free measure double; judge-named):

  0  NaN                 1  +inf               2  -inf
  3  5e-324 (subnormal)  4  1.7976931348623157e308 (max double)
  5  -0.0                6  1e-15 (cancellation)

int32 classes (p_size, l_linenumber): 2147483647 / 0 / -1 — the
boundary where int arithmetic wraps (Spark ANSI throws, DuckDB
promotes: a crash-vs-wrong-answer divergence either way).

The expected fix pattern (mirroring r12's embedding validity
contract): non-finite or cents-unrepresentable measures cost their OWN
row via a MEASURE-DOMAIN predicate stated identically on both sides —
see operators/exact.py's tick contract — while every IN-domain extreme
(negative, zero, -0.0, subnormal, precision-edge) must hash-match.

Masks/classes are DETERMINISTIC (null_stress's Knuth hash recipe);
manifest-guarded rebuilds. Both engines read the SAME parquet, so any
mismatch is a genuine semantics divergence.

Reference anchor: the reference's only numeric contract is the typed
JSON decode (TestMsgJsonSerde.scala:17-22) — a field that fails to
parse as a number costs its record; an out-of-domain number that
PARSES is this axis's subject (SURVEY §1.1 row 7).

Run:    python -m zio_kinesis_example_spark.tools.numeric_stress \
            [--src /root/testdata/sf0.01] [--out /tmp/numstress_sf001] \
            [--queries a,b] [--build-only] [--rate-scale N]
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

FIXED = ("region", "nation", "documents", "embeddings")

MONEY_VALUES = [0.0, -0.0, -99999.99, 99999999999999.984375,
                899999999999.9844, 0.004999, 123.456789]
QTY_VALUES = [0.0, -5.0, 0.5, 2147483647.0, 1e15]
RATE_VALUES = [-0.25, 1.5, 0.999999]
EVENT_VALUES = [float("nan"), float("inf"), float("-inf"),
                5e-324, 1.7976931348623157e308, -0.0, 1e-15]
INT32_VALUES = [2147483647, 0, -1]

#: (table, column) -> (class values, permille PER CLASS at scale 1)
PLAN: dict[str, dict[str, tuple[list, int]]] = {
    "lineitem": {
        "l_extendedprice": (MONEY_VALUES, 5),
        "l_quantity": (QTY_VALUES, 5),
        "l_discount": (RATE_VALUES, 5),
        "l_tax": (RATE_VALUES, 5),
        "l_linenumber": (INT32_VALUES, 5),
    },
    "orders": {"o_totalprice": (MONEY_VALUES, 5)},
    "events": {"value": (EVENT_VALUES, 5)},
    "customer": {"c_acctbal": (MONEY_VALUES, 5)},
    "supplier": {"s_acctbal": (MONEY_VALUES, 5)},
    "part": {"p_retailprice": (MONEY_VALUES, 5),
             "p_size": (INT32_VALUES, 5)},
}


def _bucket(n: int, table: str, column: str) -> np.ndarray:
    seed = np.uint64(zlib.crc32(f"{table}.{column}.numeric".encode()))
    idx = np.arange(n, dtype=np.uint64)
    h = (idx + np.uint64(1)) * _KNUTH + seed * np.uint64(0x9E3779B9)
    h ^= h >> np.uint64(16)
    h *= _KNUTH
    h ^= h >> np.uint64(13)
    return (h % np.uint64(1000)).astype(np.int64)


def build_numeric_proxy(out_dir: str, src: str = SRC,
                        rate_scale: int = 1) -> str:
    """rate_scale multiplies every per-class permille (each class's
    width capped so all classes fit in 1000): scale 1 is the
    realistic-lake axis (~2-4% stressed per column); scale 10 is the
    DEGENERATE axis — groups that are mostly poison, hours whose every
    value is an extreme — the domination-edge class a few-percent rate
    cannot reach."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"src": src, "rate_scale": rate_scale, "v": 1,
            "plan": {t: {c: [repr(v) for v in vals] + [pm]
                         for c, (vals, pm) in cols.items()}
                     for t, cols in PLAN.items()}}
    try:
        with open(manifest) as fh:
            if json.load(fh) == want:
                return out_dir
    except (OSError, ValueError):
        pass

    for name in FIXED:
        shutil.copyfile(os.path.join(src, f"{name}.parquet"),
                        os.path.join(out_dir, f"{name}.parquet"))
    for name, cols_plan in PLAN.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        n = t.num_rows
        cols = []
        for field in t.schema:
            col = t.column(field.name).combine_chunks()
            if field.name in cols_plan:
                values, permille = cols_plan[field.name]
                pm = min(permille * rate_scale, 1000 // len(values))
                b = _bucket(n, name, field.name)
                arr = col.to_numpy(zero_copy_only=False).copy()
                for ci, v in enumerate(values):
                    sel = (b >= ci * pm) & (b < (ci + 1) * pm)
                    arr[sel] = v
                col = pa.array(arr, type=field.type)
            cols.append(col)
        pq.write_table(pa.Table.from_arrays(cols, schema=t.schema),
                       os.path.join(out_dir, f"{name}.parquet"))
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
                    help="multiply every per-class permille; 10 = the "
                         "degenerate poison-dominated stress axis")
    args = ap.parse_args()
    out = args.out or ("/tmp/numstress_" + os.path.basename(
        args.src.rstrip("/")).replace(".", "")
        + (f"_x{args.rate_scale}" if args.rate_scale != 1 else ""))
    build_numeric_proxy(out, src=args.src, rate_scale=args.rate_scale)
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
