"""Time-series operators over the events hypertable: multi-level rollups,
gap filling, interval-range windows, OHLC resampling.

The reference's only time dimension is arrival order (per-shard sequence
numbers, CheckpointOnChunkEndStreamClient.scala:40-55); these queries are
the [north-star] batch analytics a 100 TB event store needs on top of that
ordered ingest (BASELINE.json north_star; SURVEY.md §2.2 window family).

Scale stance:
- The hypertable rollup is a TWO-LEVEL aggregation: raw→hour shrinks the
  data by orders of magnitude map-side before the day level runs over the
  hourly partials — the continuous-aggregate shape (hour partials are what
  a production pipeline would persist and serve day/week/month from,
  never rescanning raw).
- Gap filling never inflates the fact table: the dense spine is
  |event_types| × |hours| (generated, tiny), the facts are left-joined
  onto it, and the forward fill is one window per series.
- The interval-range window shuffles once on user_id; the frame is
  computed by a single ordered scan per partition (no self-join — the
  naive SQL formulation of "trailing 1h sum" is an O(n²) range self-join).
- OHLC resampling shares ONE exchange on (event_type, hour) across both
  window sorts and the final aggregate (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query
from .exact import (
    SQL_HOURLY_CENTS_MEAN_E6, dec_sum_double, hourly_cents_mean_e6,
    measure_domain, tick_filter,
)


#: Declared gapfill validity domain (TimescaleDB's
#: ``time_bucket_gapfill(start, finish)`` makes the bounds REQUIRED
#: arguments for exactly this reason): a dense-spine operator whose
#: bounds come from raw min/max is one-bad-clock-fragile — the r12
#: temporal proxy put a single 2106-02-07 tick in events and the
#: unclamped spine inflated from ~170 hours to 1.19 M (the oracle's
#: IGNORE-NULLS backfill then went quadratic in it; both engines
#: timed out at 300× their clean wall). A tick outside the declared
#: domain is a malformed clock and costs its OWN row — the decode-
#: failure contract (TestMsgJsonSerde.scala:17-22) applied to time.
TS_DOMAIN_LO = "2020-01-01 00:00:00"
TS_DOMAIN_HI = "2033-01-01 00:00:00"
SQL_TS_DOMAIN = (f"ts >= TIMESTAMP '{TS_DOMAIN_LO}' "
                 f"AND ts < TIMESTAMP '{TS_DOMAIN_HI}'")


def ts_domain_filter():
    """Spark twin of SQL_TS_DOMAIN (NTZ literals: the lake's event
    times are timezone-free on both engines)."""
    return F.expr(f"ts >= TIMESTAMP_NTZ '{TS_DOMAIN_LO}' "
                  f"AND ts < TIMESTAMP_NTZ '{TS_DOMAIN_HI}'")


def _hourly_spine(hourly: DataFrame) -> DataFrame:
    """Dense (event_type × hour) spine derived from the BOUNDED hourly
    aggregate — ONE definition shared by q_ts_gapfill and
    q_ts_interpolate (r9 review: the construction was duplicated
    near-verbatim, and both queries additionally re-scanned the RAW
    events table for bounds and the type list while their docstrings
    claimed one raw scan; every type and hour present in raw survives
    the rollup, so deriving both from ``hourly`` is result-identical —
    and measured: Catalyst FOLDS these derived aggregates through the
    rollup into single-column pruned raw scans (ts-only /
    event_type-only metadata passes), so the VALUE aggregation runs
    once and the bounds/type passes never read the fact columns)."""
    bounds = hourly.agg(F.min("bucket_hour").alias("lo"),
                        F.max("bucket_hour").alias("hi"))
    return (
        hourly.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour")))
            .alias("bucket_hour"),
        )
    )


@query(
    "q_ts_rollup_hypertable",
    oracle="""
        WITH hourly AS (
            SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS bucket_hour,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   -- DECIMAL partials kept decimal THROUGH the second
                   -- level (r9 review: a raw double sum-of-sums
                   -- reassociates in partition order TWICE — the exact
                   -- 1-ulp drift class exact.dec_sum_double closes);
                   -- one double conversion at the very end
                   -- measure-domain guard (r13): a NaN/inf/huge
                   -- value costs its own cell, never the bucket
                   SUM(CAST(CASE WHEN abs(value) < 9.0e11 THEN value END
                            AS DECIMAL(18,4))) AS sum_value,
                   MAX(CASE WHEN abs(value) < 9.0e11 THEN value END)
                       AS max_value
            FROM events
            GROUP BY 1, 2
        )
        SELECT CAST(time_bucket(INTERVAL 1 DAY, bucket_hour) AS TIMESTAMP) AS bucket_day,
               event_type,
               CAST(SUM(n_events) AS BIGINT) AS n_events,
               CAST(SUM(sum_value) AS DOUBLE) AS sum_value,
               MAX(max_value) AS max_value,
               CAST(COUNT(*) AS BIGINT) AS hours_with_data
        FROM hourly
        GROUP BY 1, 2
    """,
    tags=("timeseries", "rollup"),
)
def q_ts_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: raw events roll up to hourly
    buckets, and the DAILY level is computed FROM the hourly partials
    (sum-of-sums, max-of-maxes, count-of-buckets) — never from raw.

    At 100 TB the hourly layer is the materialization boundary: it is
    ~|types|×|hours| rows regardless of raw volume, so the second-level
    aggregation is effectively free, and day/week/month all derive from
    the same partials. Spark executes raw→hour with map-side partial
    aggregation, so the only full-data shuffle carries ≤ groups×partitions
    rows.
    """
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal partials stay decimal through the day level — see
            # the oracle comment (raw double sum-of-sums is the at-scale
            # 1-ulp hash hazard, squared by the two-level shape)
            F.sum(F.when(measure_domain("value"), F.col("value"))
                  .cast("decimal(18,4)")).alias("sum_value"),
            F.max(F.when(measure_domain("value"), F.col("value")))
            .alias("max_value"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("bucket_hour")).alias("bucket_day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("double").alias("sum_value"),
            F.max("max_value").alias("max_value"),
            F.count(F.lit(1)).alias("hours_with_data"),
        )
    )


@query(
    "q_ts_gapfill",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS bucket_hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(CASE WHEN abs(value) < 9.0e11 THEN value END
                            AS DECIMAL(18, 4))) AS DOUBLE)
                       AS sum_value
            FROM events WHERE __TS_DOMAIN__ GROUP BY 1, 2
        ),
        -- bounds and the type list come from the BOUNDED hourly
        -- aggregate, not a raw re-scan (see _hourly_spine)
        bounds AS (
            SELECT MIN(bucket_hour) AS lo, MAX(bucket_hour) AS hi
            FROM hourly
        ),
        spine AS (
            SELECT t.event_type, g.h AS bucket_hour
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                FROM bounds
            ) g
        )
        SELECT s.event_type,
               s.bucket_hour,
               COALESCE(h.n_events, 0) AS n_events,
               last_value(h.sum_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.bucket_hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_sum
        FROM spine s
        LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.bucket_hour = h.bucket_hour
    """.replace("__TS_DOMAIN__", SQL_TS_DOMAIN),
    tags=("timeseries", "gapfill"),
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-series gap filling: generate the full (event_type × hour)
    spine, left-join the sparse hourly facts onto it, zero-fill counts and
    forward-fill (last-observation-carried-forward) the value column.

    Scale shape: the spine is generated, not scanned — |types| ×
    |hours| rows (thousands) independent of raw volume, so the join's
    build side is the TINY spine-joined aggregate. The VALUE columns are
    aggregated in exactly one raw pass; the spine's bounds/type-list are
    written against the hourly aggregate (_hourly_spine) and Catalyst
    folds them through the rollup into single-column pruned raw scans
    (ts-only / event_type-only) — cheap metadata passes, not repeats of
    the value aggregation. The forward fill is one window sort per
    series, partitioned on event_type.
    """
    # declared validity domain — see TS_DOMAIN_LO: one bad clock must
    # not inflate the generated spine (it costs its own row instead)
    e = load(spark, sf_dir, "events").filter(ts_domain_filter())
    hourly = (
        e.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum emitted as double (r9 review: the raw
            # double SUM was the documented 1-ulp reassociation hazard
            # feeding the hash compare — and the forward fill COPIES
            # this value, so exactness here covers filled rows too)
            dec_sum_double("value").alias("sum_value"),
        )
    )
    spine = _hourly_spine(hourly)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        # hourly is bounded at |types|×|hours| rows whatever the raw
        # volume — broadcast it so the generated spine never shuffles.
        spine.join(F.broadcast(hourly), ["event_type", "bucket_hour"], "left")
        .select(
            "event_type",
            "bucket_hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_sum"),
        )
    )


@query(
    "q_win_range_interval",
    oracle="""
        SELECT event_id, user_id, ts,
               CAST(COUNT(*) OVER w AS BIGINT) AS trailing_cnt_1h,
               -- exact DECIMAL frame sum (r9 review): DuckDB computes
               -- windowed double sums via segment-tree association,
               -- Spark re-accumulates frames sequentially — same frame,
               -- different addition order; decimal never reassociates
               CAST(SUM(CAST(CASE WHEN abs(value) < 9.0e11 THEN value END
                              AS DECIMAL(18, 4))) OVER w AS DOUBLE)
                   AS trailing_sum_1h
        FROM (SELECT *, CAST(epoch_us(time_bucket(INTERVAL 1 SECOND, ts))
                             // 1000000 AS BIGINT) AS ts_s FROM events)
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts_s
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
        )
    """,
    tags=("window", "timeseries"),
)
def q_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user window via a RANGE frame on event-time
    (FLOORED epoch seconds — exact integers on both engines, see the
    ts_s comment; ties at the same second are frame peers in both).

    Scale shape: ONE shuffle on user_id, then a single ordered scan per
    partition maintains the sliding frame — the declarative replacement
    for the O(n²) "self-join events within the last hour" formulation.
    Skewed users are the risk at 100 TB; the frame computation itself is
    streaming (constant memory), so skew costs time, not OOM, and AQE
    can split oversized partitions.
    """
    e = load(spark, sf_dir, "events")
    # FLOOR of epoch seconds, exact-integer on both engines (r12
    # temporal proxy, two catches in one expression): timestampdiff
    # TRUNCATES toward zero, so a pre-1970 fractional-second row landed
    # in second 0 here and second -1 in the oracle's floor(epoch(ts));
    # and the oracle's own double epoch() loses integer exactness at
    # year 9999 (floor(253402300799.999999 as DOUBLE) = ...800). Both
    # sides now floor in the calendar domain (date_trunc/time_bucket to
    # the second — calendar truncation IS time-domain floor) and divide
    # the exact BIGINT micros; the DIV by 1e6 has no remainder, so
    # truncate == floor.
    ts_s = F.expr(
        "unix_micros(cast(date_trunc('SECOND', ts) as timestamp)) "
        "DIV 1000000"
    )
    w = Window.partitionBy("user_id").orderBy(ts_s).rangeBetween(-3600, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("trailing_cnt_1h"),
        # exact decimal frame sum — see the oracle comment
        F.sum(F.when(measure_domain("value"), F.col("value"))
              .cast("decimal(18,4)")).over(w)
        .cast("double").alias("trailing_sum_1h"),
    )


@query(
    "q_ts_resample_ohlc",
    oracle="""
        WITH ranked AS (
            SELECT event_type,
                   CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS bucket_hour,
                   value,
                   row_number() OVER (
                       PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                       ORDER BY ts, event_id
                   ) AS rn_asc,
                   row_number() OVER (
                       PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn_desc
            FROM events
        )
        SELECT event_type, bucket_hour,
               MAX(CASE WHEN rn_asc = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_desc = 1 THEN value END) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_ticks
        FROM ranked
        GROUP BY 1, 2
    """,
    tags=("timeseries", "resample"),
)
def q_ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) resampling of the value series into
    hourly candles per event_type — the classic downsample for metric and
    market data. First/last are tie-broken on (ts, event_id) so the
    answer is deterministic under same-timestamp ticks.

    Scale shape: both row_number windows and the final aggregate share
    ONE exchange on the (event_type, hour) grouping — Catalyst reuses the
    partitioning, the second window only re-sorts. The aggregate is then
    partial. An alternative single-pass form is max_by/min_by on a
    (ts, event_id) struct; the window form is kept because the shared-
    exchange plan is asserted in tests/test_plans.py either way.
    """
    e = load(spark, sf_dir, "events")
    # Project the bucket FIRST so both windows and the aggregate key on
    # the same attribute — Catalyst then reuses one hash exchange for all
    # three (partitioning on the raw date_trunc expression in the window
    # spec defeats the reuse and costs a second shuffle).
    base = e.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        "value",
        "ts",
        "event_id",
    )
    w_asc = Window.partitionBy("event_type", "bucket_hour").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_desc = Window.partitionBy("event_type", "bucket_hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.select(
        "event_type",
        "bucket_hour",
        "value",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.row_number().over(w_desc).alias("rn_desc"),
    )
    return (
        ranked.groupBy("event_type", "bucket_hour")
        .agg(
            F.max(F.when(F.col("rn_asc") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_desc") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


@query(
    "q_ts_interpolate",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS bucket_hour,
                   __HOURLY_CENTS_MEAN_E6__ AS v
            FROM events
            WHERE event_type IN ('purchase', 'signup')
              AND ts IS NOT NULL AND abs(value) < 9.0e11
              AND __TS_DOMAIN__
            GROUP BY 1, 2
        ),
        -- bounds and the type list come from the BOUNDED hourly
        -- aggregate, not raw re-scans (see _hourly_spine)
        bounds AS (
            SELECT MIN(bucket_hour) AS lo, MAX(bucket_hour) AS hi
            FROM hourly
        ),
        spine AS (
            SELECT t.event_type, g.h AS bucket_hour,
                   CAST(epoch(g.h) // 3600 AS BIGINT) AS th
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(lo, hi,
                                      INTERVAL 1 HOUR)) AS h
                        FROM bounds) g
        ),
        j AS (
            SELECT s.event_type, s.bucket_hour, s.th, h.v,
                   last_value(CASE WHEN h.v IS NOT NULL
                                   THEN {'t': s.th, 'v': h.v} END
                              IGNORE NULLS) OVER (
                       PARTITION BY s.event_type ORDER BY s.bucket_hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS p,
                   first_value(CASE WHEN h.v IS NOT NULL
                                    THEN {'t': s.th, 'v': h.v} END
                               IGNORE NULLS) OVER (
                       PARTITION BY s.event_type ORDER BY s.bucket_hour
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS n
            FROM spine s
            LEFT JOIN hourly h
              ON s.event_type = h.event_type
             AND s.bucket_hour = h.bucket_hour
        )
        -- the lerp is EXACT BIGINT micro-units with half-away-from-zero
        -- division ((2a ± b) // (2b) — Spark DIV and DuckDB // both
        -- truncate toward zero, the r6 rule), then ONE division by 1e6:
        -- no round() anywhere, so the 6dp TIE class the null sweep
        -- caught (66.4371875 rounding differently per engine) cannot
        -- exist. Midpoint gaps (even-hour gap, odd micro-delta) tie the
        -- same way.
        SELECT event_type, bucket_hour,
               v IS NOT NULL AS observed,
               CAST(CASE WHEN v IS NOT NULL THEN v
                         WHEN p IS NOT NULL AND n IS NOT NULL
                         THEN p.v + CASE
                             WHEN (n.v - p.v) * (th - p.t) >= 0
                             THEN (2 * (n.v - p.v) * (th - p.t)
                                   + (n.t - p.t)) // (2 * (n.t - p.t))
                             ELSE (2 * (n.v - p.v) * (th - p.t)
                                   - (n.t - p.t)) // (2 * (n.t - p.t))
                             END
                    END AS DOUBLE) / 1000000.0 AS value_interp
        FROM j
    """.replace("__HOURLY_CENTS_MEAN_E6__",
               SQL_HOURLY_CENTS_MEAN_E6)
       .replace("__TS_DOMAIN__", SQL_TS_DOMAIN),
    tags=("timeseries", "interpolate", "gapfill"),
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a dense hourly spine (TimescaleDB's
    ``interpolate``, next to q_ts_gapfill's LOCF): missing hours take the
    time-weighted average of the nearest observed hours on either side;
    hours outside the observed range stay NULL. Sparse event types only,
    so real gaps exist at every SF.

    DETERMINISM (r12 upgrade): the whole value path is EXACT BIGINT
    micro-units — hourly mean via integer half-up (exact.
    hourly_cents_mean_e6; the old double mean hit a REAL 6dp rounding
    tie, 66.4371875, that Spark rounded up and DuckDB down), and the
    lerp via half-away-from-zero integer division — with ONE final
    /1e6 to double. No round() remains in the path, so no tie class.

    NULL CONTRACT (r12): null-ts events are not ticks; an hour whose
    every value is NULL is NO observation (it becomes a gap to
    interpolate, not a NULL that poisons the series) — both sides
    state the same tick filter.

    Scale shape: the value column is aggregated in ONE raw pass
    (bounded at |types|×|hours| rows, broadcast); the spine's
    bounds/type-list derive from the hourly aggregate (_hourly_spine;
    Catalyst folds them into single-column pruned raw scans); the
    generated spine never shuffles for the join; prev/next anchors are
    two frames over ONE window sort per series — no self-join, no
    per-gap search.
    """
    types = ("purchase", "signup")
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*types)
        & F.col("ts").isNotNull() & measure_domain("value")
        & ts_domain_filter())   # declared domain — see TS_DOMAIN_LO
    # EXACT BIGINT micro-units for the hourly mean (see the docstring's
    # r12 tie history); v is LONG value·1e6 here, divided once at the end
    hourly = hourly_cents_mean_e6(e, "v")
    spine = _hourly_spine(hourly).withColumn(
        "th",
        F.expr("CAST(unix_seconds(cast(bucket_hour as timestamp)) "
               "DIV 3600 AS BIGINT)"),
    )
    entry = F.when(F.col("v").isNotNull(),
                   F.struct(F.col("th").alias("t"), F.col("v").alias("v")))
    w_prev = (Window.partitionBy("event_type").orderBy("bucket_hour")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_next = (Window.partitionBy("event_type").orderBy("bucket_hour")
              .rowsBetween(1, Window.unboundedFollowing))
    j = (
        spine.join(F.broadcast(hourly), ["event_type", "bucket_hour"], "left")
        # ONE select for both anchors: Spark plans same-partitioning
        # window expressions (even with different frames) into a single
        # Window node only when they appear in one projection — chained
        # withColumns leave two (q_events_pattern's lesson).
        .select("*",
                F.last(entry, ignorenulls=True).over(w_prev).alias("p"),
                F.first(entry, ignorenulls=True).over(w_next).alias("n"))
    )
    # integer lerp, half-away-from-zero: (2a ± b) DIV (2b), b > 0
    lerp_e6 = F.expr(
        "p.v + CASE WHEN (n.v - p.v) * (th - p.t) >= 0 "
        "THEN (2 * (n.v - p.v) * (th - p.t) + (n.t - p.t)) "
        "     DIV (2 * (n.t - p.t)) "
        "ELSE (2 * (n.v - p.v) * (th - p.t) - (n.t - p.t)) "
        "     DIV (2 * (n.t - p.t)) END")
    return j.select(
        "event_type", "bucket_hour",
        F.col("v").isNotNull().alias("observed"),
        (F.when(F.col("v").isNotNull(), F.col("v"))
         .when(F.col("p").isNotNull() & F.col("n").isNotNull(), lerp_e6)
         .cast("double") / F.lit(1_000_000.0)).alias("value_interp"),
    )


_EWMA_ALPHA = 0.3


@query(
    "q_ts_ewma",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS h,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS v
            FROM events
            WHERE ts IS NOT NULL AND abs(value) < 9.0e11
            GROUP BY 1, 2
        ),
        series AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_hours,
                   list(v ORDER BY h) AS vs
            FROM hourly GROUP BY event_type
        )
        SELECT event_type, n_hours,
               round(list_reduce(CAST(vs AS DOUBLE[]),
                     (acc, x) -> CAST({_EWMA_ALPHA} AS DOUBLE) * x
                               + CAST({1 - _EWMA_ALPHA} AS DOUBLE) * acc), 6)
                   AS ewma
        FROM series
    """,
    tags=("timeseries", "smoothing"),
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per series (α = 0.3,
    s₀ = x₀, sᵢ = αxᵢ + (1−α)sᵢ₋₁) — the recursive smoother SQL windows
    cannot express (each value depends on the previous RESULT, not the
    previous row), done as an ordered in-group fold.

    DETERMINISM: hourly inputs are exact-cents sums (int64 + one
    division — never a reassociating double SUM), and both engines fold
    the identically-ordered series with the identical two-op recurrence
    (Spark `aggregate` HOF / DuckDB `list_reduce`), so every
    intermediate rounds the same way; emitted 6dp.

    Scale shape: one partial-agged hourly rollup, then ONE shuffle to
    collect each series (sort_array on (hour, value) structs gives the
    fold order without a window sort). Per-series state is the series
    itself — fine for bounded series (hours per type); unbounded series
    stream through the IMPLEMENTED streaming twin
    (streaming/smooth.py `smooth_stateful`, r10): the same
    recurrence carrying O(1) state per key in the state store,
    restart-verified against this fold in tests/test_streaming.py.
    """
    # NULL CONTRACT (r12, found by the sf0.1 null sweep): a NULL-ts
    # event is not a tick (its null-h group otherwise folds FIRST in
    # Spark's sort_array and LAST in DuckDB's ORDER BY — divergent),
    # and an hour whose every value is NULL is NO observation (v =
    # SUM(nothing) = NULL would otherwise poison the ENTIRE series fold
    # to NULL on both engines — a degenerate agreement the sf0.01 sweep
    # could not distinguish from correctness). One pre-filter states
    # both: SUM already skips nulls inside mixed hours.
    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & measure_domain("value"))
    # exact-cents hourly sums (q_ts_interpolate's rule): a double
    # SUM(value) reassociates in shuffle-fetch order and can differ
    # from DuckDB's scan-order sum by 1 ulp, which the fold propagates
    # into the 6dp rounding — int64 cents + ONE identical division are
    # engine- and run-order-independent
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg((F.sum(F.round(F.col("value") * 100).cast("long"))
              / F.lit(100.0)).alias("v"))
    )
    series = (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.expr("transform(sort_array(collect_list(struct(h, v))), "
                   "s -> s.v)").alias("vs"),
        )
    )
    fold = F.expr(
        f"aggregate(slice(vs, 2, size(vs) - 1), vs[0], "
        f"(acc, x) -> cast({_EWMA_ALPHA} as double) * x "
        f"+ cast({1 - _EWMA_ALPHA} as double) * acc)"
    )
    return series.select(
        "event_type", "n_hours", F.round(fold, 6).alias("ewma"))
