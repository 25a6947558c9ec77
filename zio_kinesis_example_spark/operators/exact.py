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

def money_term(col: str = "l_extendedprice"):
    """Exact per-row revenue term: price × (1 − discount), both factors
    DECIMAL so the product never reassociates in floats — ONE definition
    (r8 review: tpch_suite, analytics q3/q5, and q_part_abc each spelled
    it inline; the SQL twin is SQL_MONEY)."""
    return (F.col(col).cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))


def rev_str(expr) -> Column:
    """Exact decimal revenue sum rendered as the canonical string both
    engines print identically (q_tpch_q3's emission rule; SQL twin
    SQL_REV)."""
    return F.sum(expr).cast("decimal(30,8)").cast("string")


#: SQL-side twins of money_term / rev_str.
SQL_MONEY = ("CAST(l_extendedprice AS DECIMAL(18, 4)) "
             "* CAST(1 - l_discount AS DECIMAL(18, 4))")
SQL_REV = f"CAST(CAST(SUM({SQL_MONEY}) AS DECIMAL(30, 8)) AS VARCHAR)"

def hourly_cents_mean_e6(e, out_col: str, hour_col: str = "bucket_hour"):
    """Per-(event_type, hour) mean of a 2dp non-negative ``value``
    column as EXACT BIGINT micro-units (value·10⁶), rounded half-up by
    integer arithmetic: e6 = (2·Σcents·10⁴ + n) DIV (2·n).

    WHY integers all the way (r12 null-stress sweep): the old
    double-division form svc/(100·n) is a FINITE-DECIMAL rational —
    whenever n has only 2·5 factors its 7th decimal digit can be
    exactly 5, and round(x, 6) then TIES: Spark's BigDecimal HALF_UP
    rounded 66.4371875 → .437188 while DuckDB emitted .437187 (found
    at sf0.1 with 32-row hours). Integer half-up division has no tie
    ambiguity and ``e6/1e6`` is the same double on both engines.

    Callers must pre-filter the TICK CONTRACT themselves (ts and value
    non-null — see SQL_TICK_FILTER): n counts MEASURED values, so an
    hour with no measurable value produces no tick instead of a NULL
    that poisons whole-series folds. SQL twin:
    SQL_HOURLY_CENTS_MEAN_E6."""
    return (
        e.groupBy("event_type",
                  F.date_trunc("hour", F.col("ts")).alias(hour_col))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("__svc"),
             F.count(F.lit(1)).alias("__cv"))
        .select("event_type", hour_col,
                F.expr("(2 * __svc * 10000 + __cv) DIV (2 * __cv)")
                .cast("long").alias(out_col))
    )


def hourly_cents_mean(e, out_col: str, hour_col: str = "bucket_hour"):
    """Tie-free double view of :func:`hourly_cents_mean_e6` (e6/10⁶ —
    one exact-integer-to-double division, identical on both engines).
    Shared by q_ts_interpolate and q_ts_autocorr (r8 review: the block
    was copied verbatim between the two module pairs)."""
    h = hourly_cents_mean_e6(e, "__e6", hour_col=hour_col)
    return h.select("event_type", hour_col,
                    (F.col("__e6") / F.lit(1_000_000.0)).alias(out_col))


#: DuckDB twins (SELECT-list fragments; callers add aliases/filters/
#: GROUP BY). The tick filter belongs in the caller's WHERE.
SQL_HOURLY_CENTS_MEAN_E6 = (
    "(2 * SUM(CAST(round(value * 100) AS BIGINT)) * 10000 + COUNT(value)) "
    "// (2 * COUNT(value))")
SQL_HOURLY_CENTS_MEAN = (
    f"CAST({SQL_HOURLY_CENTS_MEAN_E6} AS DOUBLE) / 1000000.0")
SQL_TICK_FILTER = "ts IS NOT NULL AND value IS NOT NULL"

