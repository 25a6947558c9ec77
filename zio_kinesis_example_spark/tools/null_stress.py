"""NULL-distribution stress proxy (r12): the fourth adversarial
value-parity axis.

The driver fixtures contain ZERO NULLs in any column (verified by the
r11 judge across orders/lineitem/events/documents/customer at sf0.01),
so 220 of the 222 registered queries had never executed their null
paths — and Spark and DuckDB DISAGREE by default exactly where those
paths matter most:

- window/sort null ordering: Spark ascending = NULLS FIRST, DuckDB
  ascending = NULLS LAST (descending mirrors);
- ``collect_list`` SKIPS nulls, ``array_agg`` KEEPS them;
- ``count(col)`` vs ``count(*)`` under nulls, ``first/last`` frames,
  join keys silently dropping null rows, NOT IN vs anti-join.

This tool rewrites a fixture directory with ~2-5 % NULLs injected into
the nullable NON-KEY columns (measures, statuses, dates, strings) plus
the window-order columns (o_orderdate, l_shipdate, events.ts) — never
the primary/foreign key id columns, whose nullability is a different
contract — then the standard oracle harness
(``tools.oracle.compare_all``) sweeps the registry over the proxy.
Both engines read the SAME nulled parquet, so every hash mismatch is a
genuine semantics divergence (or a fixture-satisfied assumption, the
class the q_tpch_q21 grouping bug belonged to), never noise.

Masks are DETERMINISTIC — a Knuth-multiplicative hash of (row index,
table, column) — so the proxy is bit-reproducible without an RNG seed
file, and re-runs triage the same rows. The manifest guard follows
tools/relational_scale.py: a dest is reused only if it records the
same source and the same rate table.

Reference anchor: the reference's only malformed-data axis is the
typed JSON decode failure (TestMsgJsonSerde.scala:17-22, the
Left(DecodeError) channel); NULL routing is that contract's batch
analogue (SURVEY §1.1 row 7) — a malformed field costs its own row's
value, never the query.

Run:    python -m zio_kinesis_example_spark.tools.null_stress \
            [--src /root/testdata/sf0.01] [--out /tmp/nullstress_sf001] \
            [--queries name,name] [--build-only]
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

#: per-(table, column) null rates in permille. Key id columns are
#: deliberately absent (o_orderkey, l_orderkey/partkey/suppkey,
#: c_custkey, user_id, doc_id, vec_id, ...): a null PK/FK is a
#: different data contract — the lake's key columns are NOT NULL by
#: construction — while every column below is an ordinary nullable
#: value column a real lake WILL have nulls in. documents.text and
#: embeddings.embedding stay intact too: the text/ANN kernels carry
#: their own validity-filter contract (":vf", r11) tested separately.
RATES: dict[str, dict[str, int]] = {
    "orders": {"o_orderstatus": 30, "o_totalprice": 30,
               "o_orderdate": 20, "o_orderpriority": 40},
    "lineitem": {"l_quantity": 30, "l_extendedprice": 20,
                 "l_discount": 20, "l_tax": 20, "l_returnflag": 30,
                 "l_linestatus": 30, "l_shipdate": 20},
    "events": {"ts": 20, "event_type": 20, "value": 40, "props": 50},
    "documents": {"lang": 40, "source": 40},
    "customer": {"c_name": 20, "c_acctbal": 30, "c_mktsegment": 30},
    "part": {"p_name": 20, "p_brand": 30, "p_type": 30, "p_size": 20,
             "p_retailprice": 30},
    "supplier": {"s_name": 20, "s_acctbal": 30},
}
#: copied untouched: tiny join dims + the kernel-contract tables.
FIXED = ("nation", "region", "embeddings")

_KNUTH = np.uint64(2654435761)


def _mask(n: int, table: str, column: str, permille: int) -> np.ndarray:
    """Deterministic ~permille/1000 boolean mask over n row indices."""
    seed = np.uint64(zlib.crc32(f"{table}.{column}".encode()))
    idx = np.arange(n, dtype=np.uint64)
    h = (idx + np.uint64(1)) * _KNUTH + seed * np.uint64(0x9E3779B9)
    h ^= h >> np.uint64(16)
    h *= _KNUTH
    h ^= h >> np.uint64(13)
    return (h % np.uint64(1000)) < np.uint64(permille)


def build_null_proxy(out_dir: str, src: str = SRC,
                     rate_scale: int = 1) -> str:
    """rate_scale multiplies every declared permille rate (capped at
    500 = 50 %): scale 1 is the realistic-lake axis; scale 10 is the
    DEGENERATE axis — hours/series/groups that are entirely null,
    sub-2-point series, all-poison partitions — the empty-input edge
    class a few-percent rate cannot reach."""
    rates = {t: {c: min(500, r * rate_scale) for c, r in cols.items()}
             for t, cols in RATES.items()}
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"src": src, "rates": rates, "fixed": list(FIXED)}
    try:
        with open(manifest) as fh:
            if json.load(fh) == want:
                return out_dir
    except (OSError, ValueError):
        pass
    for name in FIXED:
        shutil.copyfile(os.path.join(src, f"{name}.parquet"),
                        os.path.join(out_dir, f"{name}.parquet"))
    for name, tab_rates in rates.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        n = t.num_rows
        cols = []
        for field in t.schema:
            col = t.column(field.name).combine_chunks()
            if field.name in tab_rates:
                m = _mask(n, name, field.name, tab_rates[field.name])
                col = pa.compute.if_else(
                    pa.array(m), pa.nulls(n, type=field.type), col)
            cols.append(col)
        pq.write_table(
            pa.Table.from_arrays(cols, schema=t.schema),
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
                    help="multiply every permille rate (cap 500); 10 = "
                         "the degenerate all-null-group stress axis")
    args = ap.parse_args()
    out = args.out or ("/tmp/nullstress_" + os.path.basename(
        args.src.rstrip("/")).replace(".", "")
        + (f"_x{args.rate_scale}" if args.rate_scale != 1 else ""))
    build_null_proxy(out, src=args.src, rate_scale=args.rate_scale)
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
