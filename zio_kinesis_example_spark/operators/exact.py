"""Shared exact-arithmetic emission helpers (ONE definition each).

The repo's determinism rule for float outputs that feed a rounded
emission or a hash compare: never let a raw double SUM reassociate in
partition order — sum an EXACT representation (int64 cents or DECIMAL)
and convert to double once, so both engines emit identical bits at any
scale factor. These helpers existed as four-plus verbatim copies across
operator modules before round 6 centralized them (the drift class the
curation/codec refactors also closed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Knuth's multiplicative-hash constant (2^32 / phi). Shared by the
#: deterministic-draw helpers in advanced.py (_knuth_draw) and the grid
#: cell hash in relational.py — with the 16-bit-split mod-2^32 product
#: trick documented at those sites keeping every term ANSI-int64-safe.
KNUTH = 2654435761


def cents_sum(col: str = "value", dp: int = 6) -> Column:
    """Exact-cents sum of a 2dp money column, emitted as a rounded
    double: int64 cent sums are associative (identical in any partition
    order), and the /100.0 + round are single IEEE ops both engines
    perform identically. The shared spelling of the expression formerly
    copy-pasted by q_win_tumbling/session/sliding_batch and
    q_join_skew_salted."""
    return F.round(
        F.sum(F.round(F.col(col) * 100).cast("long")) / F.lit(100.0), dp)


def ts_lit(day: str) -> Column:
    """Midnight TIMESTAMP_NTZ literal for a 'YYYY-MM-DD' day string —
    ONE definition of the date-literal idiom (r8 review: five inline
    spellings across relational/analytics/tpch risked drifting if the
    timezone/type policy ever changes)."""
    return F.lit(day + " 00:00:00").cast("timestamp_ntz")


def dec_sum_double(col: str, dp: int = 4) -> Column:
    """Exact DECIMAL(18,4) sum of a ≤4dp numeric column, emitted as
    DOUBLE: the decimal sum is exact (never reassociates), and the one
    decimal→double conversion is correctly rounded from the same exact
    rational on both engines — bit-identical at any group size, unlike
    a raw double SUM whose partition-merge order diverges across
    engines once groups reach ~1e7 rows (the 9-significant-digit
    canonicalization boundary)."""
    return F.sum(F.col(col).cast(f"decimal(18,{dp})")).cast("double")


def sql_dec_sum_double(col: str) -> str:
    """DuckDB twin of :func:`dec_sum_double`."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(18, 4))) AS DOUBLE)"


def dec_avg_double(col: str, dp: int = 4) -> Column:
    """Exact-sum average emitted as DOUBLE: decimal sum (exact), cast
    to double, ONE division by the group count — both engines compute
    the identical dividend and divisor."""
    return (F.sum(F.col(col).cast(f"decimal(18,{dp})")).cast("double")
            / F.count(F.lit(1)))


def sql_dec_avg_double(col: str) -> str:
    """DuckDB twin of :func:`dec_avg_double`."""
    return (f"(CAST(SUM(CAST({col} AS DECIMAL(18, 4))) AS DOUBLE)"
            f" / COUNT(*))")
