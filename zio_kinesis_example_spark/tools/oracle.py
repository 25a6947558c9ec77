"""Local oracle-parity harness: run every registered query on Spark AND its
DuckDB oracle SQL over the same parquet, compare results the way the driver
does (row count + column names + order-insensitive values) — but stricter
locally, so mismatches are caught before the driver ever sees them.

Float policy: rows are matched after canonicalization at 9 significant
digits (strictly tighter than the driver's hash compare). NaN vs NULL:
in float64-dtype pandas columns BOTH engines surface SQL NULL as NaN
(toPandas / .df() conversion), so that distinction is unverifiable here
and queries must CASE-guard 0/0-style divisions by convention (the r4
rule); in object-dtype columns (strings, booleans, decimals) every NA
marker — float NaN included — canonicalizes to NULL, because NaN is not
a representable VALUE there (r12: DuckDB renders a NULL BOOLEAN as
object-dtype NaN, Spark as None; both are the SQL NULL).
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from pyspark.sql import SparkSession

from ..catalog import TABLES, path
from ..registry import all_specs


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the testdata tables as views — the same
    registration the driver performs (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for t in TABLES:
        # single quotes doubled (r9 review: an unescaped path containing
        # ' broke the CREATE VIEW parse before any comparison ran)
        p = path(sf_dir, t).replace("'", "''")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon_val(v, precision: int = 9):
    if v is None:
        return "\x00null"
    # numpy scalars first (np.float32 is NOT a float subclass, np.int64
    # not an int subclass): without this, ARRAY<FLOAT> elements would
    # bypass the 9-significant-digit float policy and compare as raw
    # str() — canonical_rows only coerces TOP-LEVEL cells
    if hasattr(v, "item") and type(v).__name__ != "ndarray":
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00nan"
        return f"{v:.{precision}g}"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (int,)):
        return f"i{v}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_val(x, precision) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_val(x, precision)) for k, x in v.items()))
    return str(v)


def canonical_rows(df: pd.DataFrame, precision: int = 9) -> list[tuple]:
    cols = sorted(df.columns)
    # object-dtype columns (strings, booleans, decimals) cannot carry
    # NaN as a VALUE — a float NaN there is an NA marker (r12
    # null-stress sweep: DuckDB's .df() renders a NULL BOOLEAN as
    # object-dtype NaN while Spark's toPandas gives None; the SQL value
    # is NULL on both sides). The NaN≠NULL policy below protects
    # 0/0-style divergences, which only exist in float-dtype columns.
    is_obj = [df[c].dtype == object for c in cols]
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v, obj_col in zip(row, is_obj):
            if v is not None and not isinstance(v, (list, tuple, dict, bytes)) \
               and type(v).__name__ != "ndarray" and pd.isna(v):
                # float NaN stays NaN (canonicalizes "\x00nan") in
                # FLOAT-dtype columns: mapping it to None would equate
                # Spark's NULL with DuckDB's NaN on 0/0-style divisions
                # and mask the divergence this harness exists to catch.
                # Non-float NA markers (NaT, pandas NA) and ANY NA in an
                # object-dtype column normalize to NULL. np.floating
                # covers FLOAT (float32) scalar columns (r9 review:
                # np.float32 is not a float subclass, so a float32 NaN
                # was wrongly normalized to NULL here while the
                # array-element path kept it NaN).
                if obj_col or not (isinstance(v, (float, np.floating))
                                   and math.isnan(v)):
                    v = None
            elif hasattr(v, "item") and type(v).__name__ != "ndarray":
                v = v.item()  # numpy scalar → python
            elif isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            vals.append(_canon_val(v, precision))
        out.append(tuple(vals))
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1


def _is_out_of_range_ts_error(e: BaseException) -> bool:
    """True when the failure is Arrow's out-of-ns-range timestamp cast.

    Matching ONLY the literal message "out of bounds timestamp" pinned
    a pyarrow implementation detail (r12 ADVICE): a pyarrow upgrade
    rewording the message would silently re-break year-1/9999
    collection. So also unwrap the exception chain (Spark wraps arrow
    errors differently per collection path) looking for ArrowInvalid
    with a broader out-of-bounds pattern."""
    try:
        from pyarrow.lib import ArrowInvalid
    except ImportError:                      # pragma: no cover
        ArrowInvalid = ()
    seen: set[int] = set()
    cur: BaseException | None = e
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        msg = str(cur)
        if "out of bounds timestamp" in msg:
            return True
        if isinstance(cur, ArrowInvalid) and (
                "out of bounds" in msg or "would result in" in msg):
            return True
        cur = cur.__cause__ or cur.__context__
    return False


def _spark_pdf(df) -> pd.DataFrame:
    """df.toPandas() with a fallback for out-of-ns-range timestamps.

    Spark's Arrow collection casts timestamp columns to nanoseconds,
    whose int64 epoch only spans 1677-2262 — a year-1 or year-9999
    value (the r12 temporal-stress proxy's sentinel-date classes)
    raises ArrowInvalid before any comparison runs. The fallback
    rebuilds the frame from collect() rows and re-coerces every
    NON-temporal column through a per-column Arrow round-trip
    (pa.array(vals).to_pandas()), so the dtypes match what the normal
    Arrow path produces — in particular an all-NULL bigint column
    becomes float64/NaN, NOT object/None (r12 ADVICE: bare pd.Series
    inference produced object dtype there, changing how the
    NaN-vs-NULL canonicalization saw the column); temporal columns
    stay Python objects, which canonical_rows renders via isoformat
    at any year. tests/test_edge_cases.py pins that the fallback
    actually engages on an out-of-ns-range frame."""
    import pyarrow as pa

    try:
        return df.toPandas()
    except Exception as e:  # ArrowInvalid wrapped differently per path
        if not _is_out_of_range_ts_error(e):
            raise
        try:
            from pyspark.sql.pandas.types import to_arrow_type
        except ImportError:                  # pragma: no cover
            to_arrow_type = None
        rows = df.collect()
        cols = df.columns
        data = {}
        temporal = {f.name for f in df.schema.fields
                    if f.dataType.typeName() in
                    ("timestamp", "timestamp_ntz", "date")}
        for field, c in zip(df.schema.fields, cols):
            vals = [r[c] for r in rows]
            if c in temporal:
                data[c] = pd.Series(vals, dtype="object")
                continue
            try:
                # the SCHEMA type, not value inference: an all-NULL
                # bigint column infers as Arrow null→object, but typed
                # int64 round-trips to float64/NaN like toPandas()
                at = to_arrow_type(field.dataType) if to_arrow_type else None
                data[c] = pa.array(vals, type=at).to_pandas()
            except (pa.lib.ArrowInvalid, pa.lib.ArrowNotImplementedError,
                    pa.lib.ArrowTypeError, TypeError, ValueError):
                # a value Arrow cannot represent under that type (Row
                # structs etc.) — fall back to pandas inference for
                # THIS column only
                data[c] = pd.Series(vals)
        return pd.DataFrame(data, columns=cols)


def compare_one(spark: SparkSession, con: duckdb.DuckDBPyConnection,
                name: str, sf_dir: str) -> CompareResult:
    spec = all_specs()[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only: count executor-side — collecting a potentially
        # huge result to pandas just for len() is the collect()
        # anti-pattern this repo bans elsewhere
        return CompareResult(name, True, "rows-only (no oracle)",
                             df.count(), -1)
    sdf = _spark_pdf(df)
    odf = con.sql(spec.oracle).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False,
            f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
            len(sdf), len(odf))
    if len(sdf) != len(odf):
        return CompareResult(name, False, "row count differs",
                             len(sdf), len(odf))
    s_rows = canonical_rows(sdf)
    o_rows = canonical_rows(odf)
    if s_rows != o_rows:
        # MULTISET difference, not a zip of the two sorted lists: one
        # inserted+one missing row would shift the zip alignment and
        # print unrelated (agreeing) rows as the sample diffs
        from collections import Counter

        s_only = list((Counter(s_rows) - Counter(o_rows)).elements())[:3]
        o_only = list((Counter(o_rows) - Counter(s_rows)).elements())[:3]
        return CompareResult(
            name, False,
            f"values differ, spark-only e.g. {s_only} / "
            f"oracle-only e.g. {o_only}",
            len(sdf), len(odf))
    return CompareResult(name, True, "hash-match", len(sdf), len(odf))


def compare_all(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> list[CompareResult]:
    con = duckdb_connection(sf_dir)
    results = []
    for name in sorted(all_specs()) if names is None else names:
        try:
            results.append(compare_one(spark, con, name, sf_dir))
        except Exception as e:  # surface, don't abort the sweep
            results.append(CompareResult(name, False,
                                         f"EXCEPTION {type(e).__name__}: {e}"))
    return results


def main() -> None:
    """Full-registry parity sweep: ``python -m
    zio_kinesis_example_spark.tools.oracle [sf_dir]``.

    Run once per round at sf0.1 (~15 min on local[16]) in addition to
    the sf0.01 driver gate: larger groups expose partition-order float
    reassociation and banding-recall defects the small SF cannot (the
    round-4 sweep caught both kinds). Exits non-zero on any mismatch.
    """
    import sys as _sys

    sf_dir = _sys.argv[1] if len(_sys.argv) > 1 else "/root/testdata/sf0.1"
    # the project session, not a bare one: Arrow collect (the sweep
    # toPandas-es multi-million-row frames), 8g driver heap, broadcast
    # threshold — the same plans every other entry point gets
    from ..session import get_spark
    spark = get_spark(cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    res = compare_all(spark, sf_dir)
    bad = [r for r in res if not r.ok]
    for r in res:
        print(("OK  " if r.ok else "FAIL") + f" {r.name}"
              + ("" if r.ok else f"  {r.detail[:160]}"))
    print(f"checked {len(res)}, failures {len(bad)}")
    _sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
