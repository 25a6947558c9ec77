"""Degenerate-output audit — the q_ts_ewma lesson as a reusable tool.

A query can "pass" an adversarial proxy sweep with BOTH engines
emitting NULL/empty garbage: the hashes match and verify nothing (the
r12 NULL axis found exactly that — at the gate SF the ewma series
collapsed to all-NULL on both sides and the real divergence only
showed at 10×). Parity sweeps therefore need this second check: run
every registered query on the CLEAN fixtures and on a stress proxy
(Spark side only — cross-engine parity is the sweep's job) and flag
outputs that DEGENERATE under stress:

- a column whose null fraction jumps from < ``low`` to > ``high``
  (default 10 % → 90 %): the stress turned the column into a NULL
  wall on both engines at once;
- a result going from >0 rows to 0 rows: the stress emptied the query
  entirely (legitimate only when the semantics say so — each hit must
  be adjudicated, like q_curate_decontaminate's ×10 emptiness in the
  NULL axis).

Hits are REPORTS, not failures: the exit code is 0 unless
``--strict``. The adjudication ledger lives in BASELINE.md.

Run:    python -m zio_kinesis_example_spark.tools.degenerate_audit \
            --proxy /tmp/contentstress_sf001_x10 [--clean /root/testdata/sf0.01] \
            [--queries a,b] [--low 0.1] [--high 0.9] [--strict]
"""

from __future__ import annotations


def audit(spark, clean_dir: str, proxy_dir: str, names=None,
          low: float = 0.1, high: float = 0.9) -> list[dict]:
    from ..registry import all_specs

    specs = all_specs()
    if names:
        specs = {n: specs[n] for n in names}
    findings: list[dict] = []
    for name, spec in sorted(specs.items()):
        rows: dict[str, int] = {}
        frac: dict[str, dict[str, float]] = {}
        ok = True
        for side, d in (("clean", clean_dir), ("proxy", proxy_dir)):
            try:
                # _spark_pdf, not bare toPandas: year-1/9999 sentinel
                # outputs overflow Arrow's ns cast (a python-harness
                # bound, not an engine bound — see oracle._spark_pdf)
                from .oracle import _spark_pdf
                pdf = _spark_pdf(spec.fn(spark, d))
            except Exception as e:  # a crash IS a finding
                findings.append({"query": name, "kind": "exception",
                                 "side": side, "detail": repr(e)[:200]})
                ok = False
                break
            rows[side] = len(pdf)
            frac[side] = ({} if len(pdf) == 0 else
                          {c: float(pdf[c].isna().mean()) for c in pdf.columns})
        if not ok:
            continue
        if rows["clean"] > 0 and rows["proxy"] == 0:
            findings.append({"query": name, "kind": "emptied",
                             "detail": f"rows {rows['clean']} -> 0"})
        for c in frac["clean"]:
            a, b = frac["clean"].get(c, 0.0), frac["proxy"].get(c, 0.0)
            if a < low and b > high:
                findings.append({
                    "query": name, "kind": "null_wall", "column": c,
                    "detail": f"null frac {a:.3f} -> {b:.3f}"})
    return findings


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--clean", default="/root/testdata/sf0.01")
    ap.add_argument("--proxy", required=True)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--low", type=float, default=0.1)
    ap.add_argument("--high", type=float, default=0.9)
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    from ..session import get_spark

    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries.split(",") if args.queries else None
    findings = audit(spark, args.clean, args.proxy, names=names,
                     low=args.low, high=args.high)
    for f in findings:
        print("DEGEN", f, flush=True)
    print(f"findings: {len(findings)}")
    raise SystemExit(1 if (args.strict and findings) else 0)


if __name__ == "__main__":
    main()
