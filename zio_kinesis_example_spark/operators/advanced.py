"""Advanced relational operators: as-of join, percentiles/statistics,
pivot, distribution window functions, string aggregation, sessionization,
sliding event-time windows, correlated EXISTS, and training-data-pipeline
utilities (deterministic stratified sampling, sequence packing, token
histograms).

Reference parity note: none of these exist in the reference (SURVEY.md
§2.1 — its only aggregate is a global counter, FlattenChunksTest.scala:32);
they are the north-star batch surface mandated by BASELINE.json, with the
sessionization/sliding-window queries doubling as the oracle-checkable
batch analogues of the streaming surface (SURVEY.md §2.2 streaming table).

Scale notes per operator are in each docstring; the common theme is ONE
shuffle per query — window functions partition by the natural key, the
as-of join is a union + window scan (never a range-explosion join), and
every aggregation is partial-aggregated map-side by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query
from .exact import KNUTH, cents_sum, measure_domain


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------


@query(
    "q_join_asof",
    oracle="""
        -- c pre-deduped to ONE click per (user, ts) — max event_id, the
        -- Spark side's tie-break: DuckDB ASOF picks a physical-row-order-
        -- dependent candidate among equal-ts ties, so ties must be
        -- resolved BEFORE the join for the oracle to be deterministic
        WITH c AS (SELECT user_id, ts, MAX(event_id) AS event_id
                   FROM events
                   WHERE event_type = 'click' AND ts IS NOT NULL
                   GROUP BY user_id, ts),
             p AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'purchase' AND ts IS NOT NULL)
        SELECT p.event_id AS purchase_id,
               p.user_id  AS user_id,
               p.ts       AS purchase_ts,
               c.event_id AS click_id,
               c.ts       AS click_ts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase to the user's latest strictly
    earlier click (classic attribution; NULL when no prior click).

    Spark has no ASOF JOIN, and the naive range join (p.ts > c.ts) explodes
    to O(clicks × purchases) per user before aggregation. This is the
    scale-correct formulation: union both sides, ONE shuffle on user_id,
    then a per-user ordered scan where ``last(click, ignoreNulls)`` over
    rows (unbounded, -1) carries the most recent click forward. Ordering
    (ts, kind, event_id) with purchases sorted before clicks at equal ts
    enforces the *strict* inequality. Cost: one shuffle + one sort,
    independent of per-user event counts. Oracle: DuckDB's native ASOF
    LEFT JOIN (independent algorithm — binary search per row).

    NULL CONTRACT (r12): an event with NULL ts has no position on the
    as-of axis — excluded from both sides (a null-ts click would
    otherwise sort NULLS-FIRST in Spark and be carried forward as a
    phantom "latest" click, while DuckDB's ASOF never matches it).
    """
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("kind"),
        F.struct("ts", "event_id").alias("click"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("kind"),
        F.lit(None).cast("struct<ts:timestamp_ntz,event_id:bigint>")
         .alias("click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click", F.last("click", ignorenulls=True).over(w))
        .filter(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_click.event_id").alias("click_id"),
            F.col("last_click.ts").alias("click_ts"),
        )
    )


# --------------------------------------------------------------------------
# statistical aggregates
# --------------------------------------------------------------------------


@query(
    "q_agg_percentile",
    oracle="""
        SELECT event_type,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
                   + 0.0 AS median_value,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6)
                   + 0.0 AS p90_value
        FROM events
        WHERE abs(value) < 9.0e11  -- measure domain (r13): NaN/inf
                                   -- order differently in the two
                                   -- engines' percentile sorts
        GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per event type.

    Spark's ``percentile`` is the exact linear-interpolation aggregate
    (sort-based within each group, partial-aggregated). At 100 TB the
    exact form requires a per-group sort buffer — switch to
    ``approx_percentile`` (t-digest sketch, bounded memory, mergeable
    across partitions); kept exact here because the oracle must match
    bit-for-bit at round(6).
    """
    e = load(spark, sf_dir, "events").filter(measure_domain("value"))
    return e.groupBy("event_type").agg(
        (F.round(F.percentile("value", F.lit(0.5)), 6) + F.lit(0.0))
        .alias("median_value"),
        (F.round(F.percentile("value", F.lit(0.9)), 6) + F.lit(0.0))
        .alias("p90_value"),
    )


@query(
    "q_agg_stats",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 3) AS sd_price,
               round(var_samp(l_discount), 6)         AS var_discount,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 3)
                   AS covar_qty_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: stddev/variance/correlation/
    covariance. All are single-pass mergeable aggregates (Welford-style
    update + combine) — partial-aggregated map-side, one shuffle carrying
    one state row per (group, partition) at any scale."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 3).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 6).alias("var_discount"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6)
         .alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3)
         .alias("covar_qty_price"),
    )


# --------------------------------------------------------------------------
# pivot
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_pivot",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(COUNT(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
               CAST(COUNT(*) FILTER (event_type = 'view')     AS BIGINT) AS view
        FROM events
        GROUP BY user_id
    """,
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type.

    The pivot value list is EXPLICIT — omitting it makes Spark run an
    extra distinct-values job and (at scale) risks an unbounded column
    blowup. With fixed values this compiles to one grouped aggregation
    of conditional counts: single shuffle, same plan as the oracle's
    FILTER clauses.
    """
    e = load(spark, sf_dir, "events")
    piv = (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    # pivot-count yields NULL for empty cells; normalize to 0 like FILTER
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    )


# --------------------------------------------------------------------------
# distribution window functions
# --------------------------------------------------------------------------


@query(
    "q_win_ntile",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("window",),
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist) per
    priority class, fully tie-broken by o_orderkey so quartile boundaries
    are deterministic. One shuffle on the partition key + in-partition
    sort; no driver-side work.

    Scale ceiling, measured (BASELINE.md r11): the partition key has
    FIXED cardinality (~5 priority classes), so task parallelism caps
    at the class count however large orders grows — the flat ~0.2
    /unit at 10×/30×/100× is this ceiling, not shuffle growth. The
    100 TB remedy, if a fixed-class distribution rank ever dominates a
    pipeline, is the q_sort_global pattern per class: range-partition
    within each class on the order key, then offset-adjust ranks with
    per-range counts — same output, parallelism restored. Not applied
    here: the single-shuffle form is the honest default and the
    measured wall is 10.6 s at 15 M rows/class."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --------------------------------------------------------------------------
# ordered string aggregation
# --------------------------------------------------------------------------


@query(
    "q_string_agg",
    oracle="""
        SELECT c_nationkey,
               string_agg(c_name, '|' ORDER BY c_name) AS names,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer
        GROUP BY c_nationkey
    """,
    tags=("agg", "string"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per nation. Spark's collect_list has no
    deterministic order (partition arrival order), so the canonical form
    is collect → array_sort → array_join: deterministic on both engines.
    collect_list is the one deliberately memory-unbounded aggregate here —
    acceptable because group payload is bounded (customers per nation);
    never use on unbounded groups at scale."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), "|")
         .alias("names"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# --------------------------------------------------------------------------
# sessionization (gaps-and-islands) — batch analogue of session windows
# --------------------------------------------------------------------------


@query(
    "q_win_session_batch",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                            OVER (PARTITION BY user_id ORDER BY ts)
                            > 3600000000 THEN 1 ELSE 0 END AS new_sess
            FROM events
            WHERE ts IS NOT NULL),
        s AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts)
                        AS BIGINT) AS session_id
            FROM g)
        SELECT user_id, session_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               round(SUM(CAST(round((CASE WHEN abs(value) < 9.0e11 THEN value END) * 100) AS BIGINT)) / 100.0, 6)
                   AS sum_value
        FROM s
        GROUP BY user_id, session_id
    """,
    tags=("window", "session", "streaming-analogue"),
)
def q_win_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 1-hour inactivity gap (gaps-and-islands):
    the oracle-checkable batch analogue of streaming
    ``session_window(ts, '1 hour')`` (SURVEY.md §2.2 streaming table).

    Two windows over the SAME (user_id, ts) sort — Catalyst plans one
    exchange + one sort, reused by both window operators, then the final
    aggregation is partial-aggregated. Gap math in integer microseconds
    (``unix_micros``/``epoch_us``) so both engines compare exactly.

    NULL CONTRACT (r12, the null-stress sweep): an event with NULL ts
    has no position in time and is EXCLUDED from sessionization — the
    batch analogue of the reference's decode-error dead-letter channel
    (TestMsgJsonSerde.scala:17-22); a malformed record costs its own
    row, never the user's sessions. Without the explicit filter the two
    engines silently disagree on where the null row sorts (Spark NULLS
    FIRST asc, DuckDB NULLS LAST) and every later lag/island flips."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wo = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(wo)
    sess = (
        e.withColumn(
            "new_sess",
            F.when(gap > 3_600_000_000, 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_sess").over(
                wo.rangeBetween(Window.unboundedPreceding, 0)
            ).cast("long"),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # exact-cent sum (2dp data): a raw double sum reassociates in
        # partition order and can flip the 6dp rounding as groups grow
        cents_sum("value").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# sliding event-time window — batch analogue of streaming sliding windows
# --------------------------------------------------------------------------


@query(
    "q_win_sliding_batch",
    oracle="""
        WITH x AS (
            SELECT ts, value,
                   unnest([time_bucket(INTERVAL 5 MINUTE, ts),
                           time_bucket(INTERVAL 5 MINUTE, ts)
                               - INTERVAL 5 MINUTE]) AS window_start
            FROM events)
        SELECT window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               round(SUM(CAST(round((CASE WHEN abs(value) < 9.0e11 THEN value END) * 100) AS BIGINT)) / 100.0, 6)
                   AS sum_value
        FROM x
        WHERE ts >= window_start
          AND ts < window_start + INTERVAL 10 MINUTE
        GROUP BY window_start
    """,
    tags=("window", "sliding", "streaming-analogue"),
)
def q_win_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes over event time, via
    Spark's built-in ``window()`` (which replicates each row into its
    size/slide = 2 windows, then aggregates — identical semantics in
    batch and streaming). The oracle derives the same two candidate
    window starts per event with time_bucket arithmetic. Row replication
    factor is size/slide — bounded and known at plan time."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cents_sum("value").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events",
                "sum_value")
    )


# --------------------------------------------------------------------------
# correlated EXISTS
# --------------------------------------------------------------------------


@query(
    "q_exists_correlated",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 45)
    """,
    tags=("join", "subquery"),
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an extra predicate — decorrelated into a
    LEFT SEMI join (exactly what Catalyst's RewritePredicateSubquery does
    to the SQL form). The quantity filter is pushed below the join, so
    the semi-join build side only carries qualifying lineitems."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return o.join(
        li, o.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# training-data pipeline utilities [north-star]
# --------------------------------------------------------------------------


@query(
    "q_sample_stratified",
    oracle="""
        WITH r AS (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents)
        SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= 20
    """,
    tags=("sampling", "pipeline"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 20 documents per language,
    selected by ranking on md5(doc_id) — a seedless, engine-portable
    pseudo-random order (identical digest on both engines, unlike
    engine-native rand()). One shuffle on the stratum key; at 100 TB
    swap row_number for a threshold on the digest (keep if md5 < p·2¹²⁸)
    to avoid the per-stratum sort while staying deterministic."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id",
                 F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 20)
    )


@query(
    "q_text_pack",
    oracle="""
        WITH t AS (
            SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents),
        c AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS tokens_before
            FROM t)
        SELECT doc_id, lang, n_tokens,
               tokens_before // 2048 AS seq_bin
        FROM c
    """,
    tags=("packing", "pipeline"),
)
def q_text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: assign each document to a
    2048-token bin per language by cumulative token count (doc_id order).
    The streaming-friendly formulation of first-fit packing: one window
    cumsum per stratum, no driver loop, no pairwise bin search —
    the pattern that still works when 'documents' is 100 TB."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .select(
            "doc_id", "lang", "n_tokens",
            # integer DIV, never double / + cast: past 2^53 cumulative
            # tokens the long->double rounding could bin one off from
            # the oracle's exact //
            F.expr("tokens_before DIV 2048").alias("seq_bin"),
        )
    )


@query(
    "q_text_hist",
    oracle="""
        WITH t AS (
            SELECT lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents)
        SELECT lang,
               CASE WHEN n_tokens < 8 THEN '<8'
                    WHEN n_tokens < 16 THEN '8-15'
                    WHEN n_tokens < 32 THEN '16-31'
                    WHEN n_tokens < 64 THEN '32-63'
                    WHEN n_tokens < 128 THEN '64-127'
                    ELSE '>=128' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               round(AVG(n_tokens), 6) AS avg_tokens
        FROM t
        GROUP BY 1, 2
    """,
    tags=("text", "pipeline"),
)
def q_text_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram per language on power-of-two buckets —
    the profile a data-mixture pipeline computes before packing. Integer
    comparisons only (no float log2) so bucket edges are exact on both
    engines; single partial-aggregated shuffle."""
    d = load(spark, sf_dir, "documents")
    n = F.size(F.split("text", " ")).cast("long")
    bucket = (
        F.when(n < 8, "<8")
        .when(n < 16, "8-15")
        .when(n < 32, "16-31")
        .when(n < 64, "32-63")
        .when(n < 128, "64-127")
        .otherwise(">=128")
    )
    return (
        d.select("lang", n.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


# --------------------------------------------------------------------------
# latest-per-key dedup, snapshot merge, skew-salted join, approx percentile
# --------------------------------------------------------------------------


@query(
    "q_dedup_latest",
    oracle="""
        WITH r AS (
            SELECT event_id, user_id, ts, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
        SELECT event_id, user_id, ts, event_type, value
        FROM r WHERE rn = 1
    """,
    tags=("dedup", "window", "pipeline"),
)
def q_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only the latest event per user (CDC/compaction staple).

    row_number over (ts DESC, event_id DESC) rather than dropDuplicates:
    dropDuplicates keeps an *arbitrary* row per key (partition arrival
    order), which is non-deterministic under retries at scale — the
    window form is reproducible and costs the same single shuffle."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


@query(
    "q_merge_upsert",
    oracle="""
        WITH updates AS (
            SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
            FROM customer WHERE c_custkey % 10 = 0),
        inserts AS (
            -- -(key+1): strictly NEGATIVE synthetic keys, disjoint from
            -- the >= 0 base key domain at EVERY scale factor (r9 review:
            -- plain -key collided on key 0 — fixture custkeys start at
            -- 0, -0 == 0, and the full-outer join emitted a DUPLICATE
            -- primary key for customer 0, violating the CDC contract;
            -- a fixed +1e6 offset likewise collides once customer
            -- exceeds 1M rows)
            SELECT -(c_custkey + 1) AS c_custkey,
                   'new_' || c_name AS c_name,
                   0.0 AS c_acctbal
            FROM customer WHERE c_custkey % 100 = 0),
        delta AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts)
        SELECT COALESCE(d.c_custkey, t.c_custkey) AS c_custkey,
               COALESCE(d.c_name, t.c_name) AS c_name,
               COALESCE(d.c_acctbal, t.c_acctbal) AS c_acctbal
        FROM (SELECT c_custkey, c_name, c_acctbal FROM customer) t
        FULL OUTER JOIN delta d USING (c_custkey)
    """,
    tags=("join", "merge", "pipeline"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert as a full-outer join + coalesce: apply a delta of
    updates (+100 acctbal for every 10th customer) and inserts (new keys)
    onto the base snapshot — the table-format-free CDC merge. One shuffle
    on the key; at scale this is the compaction pattern under Delta/
    Iceberg MERGE INTO, expressed directly."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_name",
                (F.col("c_acctbal") + 100.0).alias("c_acctbal"))
    )
    inserts = (
        # -(key+1): strictly negative, disjoint from the >= 0 base
        # domain at any SF (r9 review: plain -key collided on key 0 and
        # duplicated customer 0 in the merged snapshot; a fixed offset
        # collides once customer outgrows it)
        c.filter(F.col("c_custkey") % 100 == 0)
        .select((-(F.col("c_custkey") + 1)).alias("c_custkey"),
                F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
                F.lit(0.0).alias("c_acctbal"))
    )
    delta = updates.unionByName(inserts)
    t = c.alias("t")
    d = delta.alias("d")
    return (
        t.join(d, F.col("t.c_custkey") == F.col("d.c_custkey"), "full_outer")
        .select(
            F.coalesce("d.c_custkey", "t.c_custkey").alias("c_custkey"),
            F.coalesce("d.c_name", "t.c_name").alias("c_name"),
            F.coalesce("d.c_acctbal", "t.c_acctbal").alias("c_acctbal"),
        )
    )


_SALT_BUCKETS = 8


@query(
    "q_join_skew_salted",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               round(SUM(CAST(round((CASE WHEN abs(value) < 9.0e11 THEN value END) * 100) AS BIGINT)) / 100.0, 6)
                   AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("join", "skew"),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join via explicit key salting: the fact side's join
    key is extended with a deterministic salt (event_id % B), the
    dimension side is replicated B ways, and the join runs on the
    composite key — a single hot user fans out over B tasks instead of
    one straggler. Result identical to the plain join (oracle is the
    unsalted SQL). At scale prefer AQE skew-join first; explicit salting
    is for when a key is hot *by construction* (null keys, default ids)
    or the engine's skew threshold misses it."""
    e = load(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % _SALT_BUCKETS).cast("int")
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).crossJoin(
        spark.range(_SALT_BUCKETS).select(F.col("id").cast("int").alias("salt"))
    )
    return (
        e.join(c, (e.user_id == c.c_custkey) & (e.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cents_sum("value").alias("sum_value"),
        )
    )


def _approx_pct_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure sketch plan — what ships at 100 TB (and what bench.py
    times): percentile_approx only, no exact-percentile twin."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", [0.5, 0.9, 0.99], 10000
        ).alias("pa")
    )


@query(
    "q_agg_approx_pct",
    oracle="""
        SELECT l_returnflag,
               TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
    bench_fn=_approx_pct_plan,
)
def q_agg_approx_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL/GK-style sketch): the bounded-memory,
    mergeable percentile for 100 TB inputs — the scale path whose exact
    twin is q_agg_percentile.

    Sketch internals are engine-specific, so (as with q_agg_approx_cd)
    the hash-checkable contract is a bound per quantile — and since r13
    it is the sketch's ACTUAL guarantee, which is a RANK bound, not a
    value bound: with accuracy 10 000 the returned value's exact rank
    is within n/10 000 of the target rank p·n. (The old form asserted
    1% RELATIVE VALUE error — true on the benign fixture distribution,
    but the numeric-stress proxy's heavy tail, 0.005 … 9e11 in one
    group, makes rank-adjacent values differ by ORDERS of magnitude
    and the value-relative claim is simply not what GK sketches
    promise.) Verified tie-robustly per quantile:
    count(< v) + 1 ≤ p·n + ε  AND  count(≤ v) ≥ p·n − ε,  ε = n/10⁴ + 1.
    The query emits one boolean per quantile and the oracle asserts the
    constant TRUE per group. bench.py times the sketch-only plan
    (_approx_pct_plan via ``bench_fn``)."""
    li = load(spark, sf_dir, "lineitem")
    qs = [0.5, 0.9, 0.99]
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", qs, 10000).alias("pa"),
        F.count(F.lit(1)).alias("n"),
    )
    j = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(agg), "l_returnflag")
    ranks = j.groupBy("l_returnflag").agg(
        F.first("n").alias("n"),
        *[F.sum(F.when(F.col("l_extendedprice") < F.col("pa")[i], 1)
                .otherwise(0)).alias(f"lt{i}") for i in range(3)],
        *[F.sum(F.when(F.col("l_extendedprice") <= F.col("pa")[i], 1)
                .otherwise(0)).alias(f"le{i}") for i in range(3)],
    )
    eps = F.col("n") / F.lit(10000.0) + F.lit(1.0)

    def ok(i: int):
        target = F.lit(qs[i]) * F.col("n")
        return ((F.col(f"lt{i}") + 1 <= target + eps)
                & (F.col(f"le{i}") >= target - eps))

    return ranks.select(
        "l_returnflag",
        ok(0).alias("p50_ok"), ok(1).alias("p90_ok"), ok(2).alias("p99_ok"),
    )


# --------------------------------------------------------------------------
# data-mixture sampling, n-gram frequencies
# --------------------------------------------------------------------------

#: per-source keep-probability (a training data mixture recipe): src0..src9
#: kept at 90%, src10..src19 at 25%.
_MIX_HI = 0.90
_MIX_LO = 0.25
_KNUTH = KNUTH  # Knuth multiplicative hash constant (shared: exact.py)
_U32 = 4294967296
_K16 = (_KNUTH * 65536) % _U32  # 16-bit-shifted Knuth constant mod 2^32


def _knuth_draw(key: str, div: str) -> str:
    """(key · KNUTH) mod 2^32 as a 16-bit-split expression: identical to
    the direct product for any key < 2^32 (every fixture key) but free
    of the int64 overflow the direct multiply hits for keys above
    ~3.47e9 under ANSI mode — snowflake-scale ids are in the queries'
    claimed 100 TB domain. ``div`` is the integer-division spelling
    ('DIV' Spark, '//' DuckDB). Non-negative keys only (both engines'
    % keeps the dividend sign)."""
    return (f"((({key}) % 65536) * {_KNUTH} "
            f"+ ((({key}) {div} 65536) % 65536) * {_K16}) % {_U32}")


@query(
    "q_sample_mixture",
    oracle=f"""
        -- thresholds interpolated as PYTHON-computed integers (r9
        -- review): Python int() truncates while DuckDB CAST(double AS
        -- BIGINT) rounds to nearest — the two agreed for the current
        -- constants only by accident of their fractional parts; one
        -- source of truth keeps a boundary draw from diverging
        SELECT doc_id, lang, source
        FROM documents
        WHERE {_knuth_draw("doc_id", "//")}
              < CASE WHEN CAST(substring(source, 4) AS INT) < 10
                     THEN {int(_MIX_HI * _U32)}
                     ELSE {int(_MIX_LO * _U32)} END
    """,
    tags=("sampling", "pipeline"),
)
def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture downsampling: keep each document with a per-source
    probability (90% for src0-9, 25% for src10-19) using a Knuth
    multiplicative hash of doc_id as the uniform draw — pure BIGINT
    arithmetic, so the 'random' decision is exact, reproducible, and
    engine-portable (unlike rand(), which differs per engine/partition).
    This is the mixture-weighting step of a training-corpus builder; at
    100 TB it is a stateless map — no shuffle at all."""
    d = load(spark, sf_dir, "documents")
    draw = F.expr(_knuth_draw("doc_id", "DIV"))
    src_num = F.substring("source", 4, 10).cast("int")
    threshold = F.when(src_num < 10, F.lit(int(_MIX_HI * _U32))) \
        .otherwise(F.lit(int(_MIX_LO * _U32))).cast("long")
    return d.filter(draw < threshold).select("doc_id", "lang", "source")


_TEMP_BUDGET = 250  # kept-doc budget for the temperature-resampled mix


@query(
    "q_sample_temperature",
    oracle=f"""
        WITH n AS (SELECT lang, COUNT(*) AS ns FROM documents GROUP BY lang),
        w AS (SELECT lang,
                     CAST(floor(sqrt(CAST(ns AS DOUBLE)) * 1000) AS BIGINT)
                         AS ws
              FROM n),
        tot AS (SELECT SUM(ws) AS tw FROM w),
        tgt AS (SELECT lang, (ws * {_TEMP_BUDGET}) // tw AS target
                FROM w, tot),
        r AS (SELECT doc_id, lang, source,
                     row_number() OVER (
                         PARTITION BY lang
                         ORDER BY {_knuth_draw("doc_id", "//")}, doc_id)
                         AS rk
              FROM documents)
        SELECT r.doc_id, r.lang, r.source, CAST(r.rk AS BIGINT) AS rk
        FROM r JOIN tgt USING (lang) WHERE rk <= target
    """,
    tags=("sampling", "pipeline"),
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture resampling (T=2, i.e. sqrt weights):
    per-language target counts ∝ n^(1/T), normalized to a fixed document
    budget — the UniMax/mT5-style step that upweights tail languages a
    proportional mix would starve. Selection within a language is the
    smallest-hash-rank prefix (q_sample_mixture's portable Knuth draw),
    so the kept set is exact and engine-reproducible.

    DETERMINISM: weights are floor(sqrt(n)·1000) as BIGINT — ONE double
    sqrt of an exact integer each (identical rounding), then all
    normalization in exact integer arithmetic (the naive Σ of double
    weights would reduce in engine-dependent order).

    Scale shape: language histogram = partial-agged groupBy collapsing to
    |langs| rows; targets broadcast back; ONE corpus shuffle for the
    per-language hash-rank window. Same two-level posture as
    q_curate_token_budget.
    """
    d = load(spark, sf_dir, "documents")
    w_ = (
        d.groupBy("lang").agg(F.count(F.lit(1)).alias("ns"))
        .select("lang", (F.floor(F.sqrt(F.col("ns").cast("double")) * 1000))
                .cast("long").alias("ws"))
    )
    tot = w_.agg(F.sum("ws").alias("tw"))
    tgt = (
        w_.crossJoin(F.broadcast(tot))
        .select("lang", F.expr(f"(ws * {_TEMP_BUDGET}) DIV tw")
                .alias("target"))
    )
    win = Window.partitionBy("lang").orderBy(
        F.expr(_knuth_draw("doc_id", "DIV")), "doc_id")
    r = d.select("doc_id", "lang", "source").withColumn(
        "rk", F.row_number().over(win).cast("long"))
    return (
        r.join(F.broadcast(tgt), "lang")
        .filter(F.col("rk") <= F.col("target"))
        .select("doc_id", "lang", "source", "rk")
    )


@query(
    "q_text_bigrams",
    oracle="""
        WITH t AS (SELECT lang, string_split(text, ' ') AS terms
                   FROM documents),
        b AS (SELECT lang,
                     unnest(list_transform(
                         generate_series(1, len(terms) - 1),
                         i -> terms[i] || ' ' || terms[i + 1])) AS bigram
              FROM t WHERE len(terms) >= 2),
        c AS (SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY COUNT(*) DESC, bigram) AS rn
              FROM b GROUP BY lang, bigram)
        SELECT lang, bigram, n, CAST(rn AS BIGINT) AS rn
        FROM c WHERE rn <= 10
    """,
    tags=("text", "pipeline"),
)
def q_text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 bigrams per language (tie-broken lexicographically): the
    n-gram statistics pass of corpus analysis. explode → two-level
    partial-aggregated count → per-lang top-k window; the count shuffle
    carries only distinct (lang, bigram) pairs."""
    d = load(spark, sf_dir, "documents")
    terms = F.split("text", " ")
    bigrams = F.expr(
        "transform(sequence(1, size(terms) - 1), "
        "i -> concat_ws(' ', terms[i - 1], terms[i]))"
    )
    counts = (
        d.select("lang", terms.alias("terms"))
        .filter(F.size("terms") >= 2)
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 10)
    )


@query(
    "q_sort_global",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        WHERE o_totalprice > 100000
    """,
    tags=("sort",),
)
def q_sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Globally sorted projection (ORDER BY without LIMIT): plans as a
    range-partitioning exchange (sampled split points) + per-partition
    sort — the scalable total order, no single-node bottleneck. The
    driver's comparator is order-insensitive, so the oracle omits the
    ORDER BY; the plan shape is asserted in test_plans.py."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


@query(
    "q_agg_multi_distinct",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
               CAST(COUNT(*) AS BIGINT) AS events
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "distinct"),
)
def q_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) over different columns in one
    aggregation: Catalyst rewrites through an Expand (one row replica per
    distinct group) so a single shuffle serves both distincts plus the
    plain count — the expand factor (#distinct clauses) is the scale
    cost to watch."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
        F.count(F.lit(1)).alias("events"),
    )


@query(
    "q_decimal_agg",
    oracle="""
        SELECT l_returnflag,
               -- measure-domain guard + DECIMAL(19,4) product width
               -- (r13; see exact.SQL_MONEY's INT128 note)
               CAST(CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) < 9.0e11
                             THEN l_extendedprice END AS DECIMAL(18, 4)))
                         AS DECIMAL(30, 4)) AS VARCHAR) AS sum_price_dec,
               CAST(CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) < 9.0e11
                             THEN l_extendedprice END AS DECIMAL(19, 4))
                             * CAST(1 - l_discount AS DECIMAL(8, 4)))
                         AS DECIMAL(30, 8)) AS VARCHAR)
                   AS sum_disc_price_dec,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "decimal"),
)
def q_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal aggregation: money math in DECIMAL(18,4), where the
    sum is EXACT and associative — float SUM results depend on partition
    count and reduction order (bit-level), decimals do not. Both engines
    promote precision identically under the SQL rules, so the comparison
    is bit-exact with no rounding escape hatch. The 100 TB rule: revenue
    rollups that must reconcile are decimal, analytics that tolerate
    1e-12 relative error are double (2× faster).

    Output sums are serialized as fixed-scale decimal STRINGS: the
    comparison must stay in exact decimal space end-to-end (DuckDB's
    pandas bridge would otherwise degrade its decimals to float64)."""
    li = load(spark, sf_dir, "lineitem")
    price = F.when(measure_domain("l_extendedprice"),
                   F.col("l_extendedprice")).cast("decimal(18,4)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("decimal(30,4)").cast("string")
         .alias("sum_price_dec"),
        F.sum(price * disc).cast("decimal(30,8)").cast("string")
         .alias("sum_disc_price_dec"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_union_distinct",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — complements q_union_all: the union is followed
    by a dedup aggregation, partial-aggregated before the shuffle so
    the exchange carries unique keys per partition only."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q_win_value_funcs",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice) OVER
                   (PARTITION BY o_custkey
                    ORDER BY o_orderdate NULLS LAST, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate NULLS LAST, o_orderkey)
    """,
    tags=("window",),
)
def q_win_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions (first/last/nth): each customer's first,
    latest, and second order price in orderdate order. last_value uses an
    explicit unbounded-following frame — the default frame ends at the
    current row, the classic silent-wrong-answer trap.

    NULL ORDERING (r12, pinned): o_orderdate sorts NULLS LAST ascending
    on BOTH sides — Spark's asc default is NULLS FIRST, DuckDB's is
    NULLS LAST, so an unpinned nullable order key silently reassigns
    first/nth between engines (caught by the null-stress sweep)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    return o.select(
        "o_orderkey", "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "q_interval_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)
                   AS plus_3_months,
               round(date_diff('day', TIMESTAMP '1995-06-01', o_orderdate)
                     / 30.4375, 4) AS months_approx,
               CAST(time_bucket(INTERVAL 3 MONTH, o_orderdate) AS TIMESTAMP)
                   AS quarter_start,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week
        FROM orders
    """,
    tags=("function", "date", "interval"),
)
def q_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic and calendar bucketing: add_months, day-count
    month fractions (computed with an explicit day/30.4375 formula —
    engines disagree on months_between edge rules, so the portable form
    IS the spec), quarter bucketing, ISO week."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        # interval add on the TIMESTAMP itself (r9 review: add_months on
        # a date cast silently discarded time-of-day while the oracle's
        # + INTERVAL preserves it — equal only while fixture orderdates
        # happen to be midnight)
        (d + F.expr("INTERVAL 3 MONTHS")).alias("plus_3_months"),
        F.round(
            F.datediff(d, F.lit("1995-06-01")) / F.lit(30.4375), 4
        ).alias("months_approx"),
        F.trunc(d, "quarter").cast("timestamp_ntz").alias("quarter_start"),
        F.quarter(d).alias("q"),
        F.weekofyear(d.cast("date")).alias("iso_week"),
    )


@query(
    "q_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS val FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount',
               CAST(l_discount AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax',
               CAST(l_tax AS DOUBLE) FROM lineitem
    """,
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): 4 measure columns become
    (measure, val) rows. Spark's unpivot is a zero-shuffle Expand node —
    each input row emits 4 output rows map-side, the mirror image of
    q_pivot's grouped aggregation; the oracle states the same reshape as
    the portable UNION ALL form."""
    li = load(spark, sf_dir, "lineitem")
    measures = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    wide = li.select(
        "l_orderkey", "l_linenumber",
        *[F.col(m).cast("double").alias(m) for m in measures],
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"], measures, "measure", "val"
    )


@query(
    "q_agg_conditional",
    oracle="""
        SELECT event_type,
               CAST(count_if(value > 0.5) AS BIGINT) AS n_hi,
               round(SUM(CASE WHEN value > 0.5
                              THEN CAST(round(value * 100) AS BIGINT)
                              ELSE 0 END) / 100.0, 6) AS sum_hi,
               bool_and(value >= 0) AS all_nonneg,
               bool_or(value > 0.99) AS any_extreme,
               round(median(value), 6) + 0.0 AS med_value
        FROM events
        WHERE abs(value) < 9.0e11  -- measure domain (r13): the
                                   -- conditional battery aggregates
                                   -- MEASURES; poison costs its row
        GROUP BY event_type
    """,
    tags=("agg", "conditional"),
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate battery: count_if, filtered sum,
    bool_and/bool_or, exact median. All single-pass mergeable aggregates
    except median, which Spark executes as an exact percentile (sorted
    partial state) — the exact twin of q_agg_approx_pct's sketch."""
    e = load(spark, sf_dir, "events").filter(measure_domain("value"))
    return e.groupBy("event_type").agg(
        F.expr("count_if(value > 0.5)").alias("n_hi"),
        F.round(
            F.sum(F.when(F.col("value") > 0.5,
                         F.round(F.col("value") * 100).cast("long"))
                  .otherwise(F.lit(0))) / F.lit(100.0),
            6,
        ).alias("sum_hi"),
        F.expr("bool_and(value >= 0)").alias("all_nonneg"),
        F.expr("bool_or(value > 0.99)").alias("any_extreme"),
        (F.round(F.median("value"), 6) + F.lit(0.0))
        .alias("med_value"),
    )


#: HLL precision shared by BOTH sketch queries' build, bench, and error
#: bounds (r9 review: lgConfigK=12 was spelled four times and the rsd
#: formula twice — tuning one literal would silently desynchronize the
#: benched plan from the correctness-checked one and leave the error
#: bound stale).
_HLL_LG_K = 12
_HLL_RSD = 1.04 / (2 ** _HLL_LG_K) ** 0.5


def _sketch_merge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure two-level sketch plan (what bench.py times): daily HLL
    sketches merged to a per-type global estimate — no exact twin."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id", F.lit(_HLL_LG_K)).alias("sk"))
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )


@query(
    "q_agg_sketch_merge",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS sketch_ok
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "approx", "sketch"),
    bench_fn=_sketch_merge_plan,
)
def q_agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketches — the pre-aggregated rollup pattern for distinct
    counts: build an HLL sketch per (event_type, day) partition, then
    union the day sketches into the global per-type estimate. This is the
    two-level shape a 100 TB pipeline materializes (daily sketch tables
    are tiny, and any date-range distinct count is a register-merge over
    them, never a rescan of raw) — the q_ts_rollup_hypertable story
    applied to a non-additive aggregate.

    lgConfigK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%. The hash-checkable contract
    is the q_agg_approx_cd error-bound pattern: ``sketch_ok`` asserts the
    merged estimate lands within 3 standard errors of exact (the sketch
    bytes themselves are engine-specific, per SURVEY §2.2); bench.py
    times the sketch-only plan via ``bench_fn``.
    """
    e = load(spark, sf_dir, "events")
    # the SAME plan bench.py times — calling the shared builder (not a
    # re-statement) so a future sketch-parameter tune cannot silently
    # desynchronize the benched plan from the correctness-checked one
    merged = _sketch_merge_plan(spark, sf_dir)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    # NULL-SAFE join key (r12 null-stress sweep): event_type is a
    # nullable GROUP key — both aggregates emit a NULL-type group, and a
    # plain equi-join would silently drop it (null keys never match),
    # losing a row the oracle keeps
    joined = merged.alias("m").join(
        exact.alias("x"),
        F.col("m.event_type").eqNullSafe(F.col("x.event_type")))
    return joined.select(
        F.col("m.event_type").alias("event_type"),
        "n_exact",
        (F.abs(F.col("approx_users") - F.col("n_exact"))
         <= F.lit(3 * _HLL_RSD) * F.col("n_exact")).alias("sketch_ok"),
    )


@query(
    "q_layout_zorder",
    oracle="""
        WITH z AS (
            SELECT l_orderkey, l_partkey,
                   list_sum(list_transform(generate_series(0, 15),
                       i -> (((l_orderkey % 65536) // (1 << i)) % 2)
                                * (1 << (2 * i))
                          + (((l_partkey % 65536) // (1 << i)) % 2)
                                * (1 << (2 * i + 1)))) AS zval
            FROM lineitem
        )
        SELECT CAST(zval // 1048576 AS BIGINT) AS zbucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok,
               MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk
        FROM z
        GROUP BY zval // 1048576
    """,
    tags=("layout", "sort"),
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (l_orderkey, l_partkey) + the
    per-bucket min/max statistics a lakehouse data-skipping index keeps:
    interleaving the two keys' bits makes each z-range bucket cover a
    BOUNDED rectangle in both dimensions, so a scan filtered on EITHER
    key can prune most buckets/files — the multi-dimensional clustering
    every 100 TB table layout (Delta OPTIMIZE ZORDER, Iceberg sort
    orders) applies before writing.

    The z-value is a pure-integer bit interleave (16 bits per key,
    wrapped mod 2^16) — exact and engine-portable; the emitted stats ARE
    the skipping index: writing `repartitionByRange(zval).sortWithinPartitions`
    turns them into parquet row-group min/max footers.

    Scale shape: stateless per-row fold + one partial-agged groupBy on
    the bucket id (≤ 4096 groups); the layout write itself would add one
    range exchange.
    """
    li = load(spark, sf_dir, "lineitem")
    # UNROLLED bit interleave (32 flat terms), not an aggregate() HOF fold:
    # higher-order functions run an interpreted lambda per element and
    # fall out of whole-stage codegen — measured 2.8 s vs 0.4 s at sf0.1
    # for this exact expression.
    terms = []
    for i in range(16):
        terms.append(f"(((l_orderkey % 65536) DIV {1 << i}) % 2) * {1 << (2 * i)}L")
        terms.append(f"(((l_partkey % 65536) DIV {1 << i}) % 2) * {1 << (2 * i + 1)}L")
    zval = F.expr(" + ".join(terms))
    return (
        li.select("l_orderkey", "l_partkey", zval.alias("zval"))
        # integer DIV, not double / + cast (r9 review: the file's own
        # q_text_pack rule — value-safe today only because zval < 2^32;
        # a wider interleave would cross 2^53 and round one bucket off)
        .groupBy(F.expr("zval DIV 1048576").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_orderkey").alias("min_ok"),
            F.max("l_orderkey").alias("max_ok"),
            F.min("l_partkey").alias("min_pk"),
            F.max("l_partkey").alias("max_pk"),
        )
    )


_PRI_K = 100  # sample size for priority sampling


@query(
    "q_sample_priority",
    oracle=f"""
        SELECT o_orderkey, o_totalprice, priority
        FROM (
            SELECT o_orderkey, o_totalprice,
                   (({_knuth_draw("o_orderkey", "//")}) * 10000)
                       // CAST(round(o_totalprice * 100) AS BIGINT)
                       AS priority
            FROM orders
            WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) >= 1
        )
        ORDER BY priority, o_orderkey
        LIMIT {_PRI_K}
    """,
    tags=("sampling", "weighted", "pipeline"),
)
def q_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional priority sampling (Duffield-Lund-Thorup):
    each row draws priority = u/w (u = portable integer hash, w = the
    row's weight in cents) and the k smallest priorities form the
    sample — heavy rows get small priorities, so inclusion probability
    grows with weight. The one-pass, mergeable weighted-sampling scheme
    a mixture builder uses when documents carry quality weights.

    DETERMINISM: u and w are exact BIGINTs (cents via round(×100) —
    identical on both engines for 2dp-generated prices), priority is one
    integer division, and the cut is fully tie-broken — no float pow
    (the Efraimidis-Spirakis u^(1/w) key needs libm pow, whose last-bit
    behavior is engine-specific).

    Scale shape: stateless per-row arithmetic + TakeOrderedAndProject
    (per-partition k-row heaps merged on the driver) — no sort, no
    shuffle beyond k rows per partition, mergeable across any partition
    count.
    """
    # guard the CENTS, not the raw price: 0 < price < 0.005 rounds to
    # cents = 0, where Spark ANSI DIV raises DIVIDE_BY_ZERO but DuckDB
    # // returns NULL (crash-vs-wrong-answer divergence)
    o = load(spark, sf_dir, "orders").filter(
        F.expr("cast(round(o_totalprice * 100) as bigint) >= 1"))
    return (
        o.select("o_orderkey", "o_totalprice",
                 F.expr(f"(({_knuth_draw('o_orderkey', 'DIV')}) * 10000) "
                        f"DIV cast(round(o_totalprice * 100) as bigint)")
                 .alias("priority"))
        .orderBy("priority", "o_orderkey")
        .limit(_PRI_K)
    )


def _sketch_intersect_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-row (est_intersection, est_union) frame — the single
    statement of the inclusion-exclusion pipeline, shared by the bench
    plan and the correctness contract (the q_agg_sketch_merge
    anti-desync rule applied to this query too, r9 review)."""
    e = load(spark, sf_dir, "events")
    sk = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(_HLL_LG_K)).alias("sk"),
             F.hll_sketch_estimate(
                 F.hll_sketch_agg("user_id", F.lit(_HLL_LG_K))).alias("est"))
    )
    u = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
        F.sum("est").alias("sum_each"),
    )
    return u.select(
        (F.col("sum_each") - F.col("est_union")).alias("est_intersection"),
        "est_union")


def _sketch_intersect_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure sketch plan bench.py times: two per-type HLL sketches,
    inclusion-exclusion intersection estimate, no exact twin."""
    return _sketch_intersect_parts(spark, sf_dir).select("est_intersection")


@query(
    "q_agg_sketch_intersect",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS sketch_ok
        FROM (
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        )
    """,
    tags=("agg", "approx", "sketch"),
    bench_fn=_sketch_intersect_plan,
)
def q_agg_sketch_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set ALGEBRA: estimated |clickers ∩ purchasers| via
    inclusion-exclusion over HLL sketches (|A|+|B|−|A∪B|) — the audience-
    overlap question every pre-aggregated sketch table answers without
    rescanning raw (HLL has no native intersect; this is the standard
    derivation, error grows as the overlap shrinks relative to the
    union).

    Contract = the q_agg_sketch_merge error-bound pattern: ``sketch_ok``
    asserts the estimate within 3·rsd·|A∪B| of the exact intersection
    (the union term dominates the error); bench times the sketch-only
    plan via ``bench_fn``.
    """
    e = load(spark, sf_dir, "events")
    # the SAME pipeline bench.py times (shared builder, anti-desync)
    u = _sketch_intersect_parts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click") \
        .select("user_id").distinct()
    purch = e.filter(F.col("event_type") == "purchase") \
        .select("user_id").distinct()
    exact = clicks.intersect(purch).agg(
        F.count(F.lit(1)).alias("n_exact"))
    return exact.crossJoin(F.broadcast(u)).select(
        "n_exact",
        (F.abs(F.col("est_intersection") - F.col("n_exact"))
         <= F.lit(3 * _HLL_RSD) * F.col("est_union")).alias("sketch_ok"),
    )


@query(
    "q_agg_weighted_pct",
    oracle="""
        -- cumulative-weight percentile_cont (r13): the old oracle
        -- MATERIALIZED the weighted multiset (unnest x quantity) — a
        -- 2^31-boundary weight made it build billions of rows, and a
        -- negative weight crashed Spark's frequency check. This form
        -- computes the identical interpolated percentile from weight
        -- prefix sums in O(n log n) at ANY weight, and the weight
        -- contract (integral via CAST, rows with weight < 1 are
        -- weightless and excluded) is stated on both sides.
        WITH w AS (
            SELECT l_returnflag, l_extendedprice AS val,
                   CAST(l_quantity AS BIGINT) AS wt
            FROM lineitem
            WHERE CAST(l_quantity AS BIGINT) >= 1
        ),
        o AS (
            SELECT l_returnflag, val, wt,
                   SUM(wt) OVER (PARTITION BY l_returnflag
                                 ORDER BY val
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum,
                   SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
            FROM (SELECT l_returnflag, val, SUM(wt) AS wt
                  FROM w GROUP BY l_returnflag, val)
        ),
        pick AS (
            SELECT l_returnflag, p,
                   -- percentile_cont over N=tot units: target index
                   -- t = p*(N-1) (0-based); lower unit floor(t),
                   -- upper unit floor(t)+1, fraction t-floor(t).
                   -- Unit k (0-based) has value of the row whose
                   -- cumulative range (cum-wt, cum] covers k+1.
                   MAX(CASE WHEN cum - wt <= CAST(floor(p * (tot - 1))
                                                  AS BIGINT)
                             AND CAST(floor(p * (tot - 1)) AS BIGINT)
                                 < cum THEN val END) AS lo_val,
                   MAX(CASE WHEN cum - wt <= least(
                                CAST(floor(p * (tot - 1)) AS BIGINT) + 1,
                                tot - 1)
                             AND least(CAST(floor(p * (tot - 1))
                                            AS BIGINT) + 1, tot - 1)
                                 < cum THEN val END) AS hi_val,
                   MAX(p * (tot - 1) - floor(p * (tot - 1))) AS frac
            FROM o, (SELECT unnest([0.5, 0.9]) AS p)
            GROUP BY l_returnflag, p
        )
        SELECT l_returnflag,
               round(MAX(CASE WHEN p = 0.5
                              THEN lo_val + frac * (hi_val - lo_val) END),
                     6) + 0.0 AS wmedian,
               round(MAX(CASE WHEN p = 0.9
                              THEN lo_val + frac * (hi_val - lo_val) END),
                     6) + 0.0 AS wp90
        FROM pick
        GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "weighted"),
)
def q_agg_weighted_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FREQUENCY-WEIGHTED percentiles: price percentiles where each
    lineitem counts with multiplicity l_quantity (unit-weighted rather
    than order-weighted statistics — the weighting every sampling/
    packing decision actually needs).

    Spark's ``percentile(col, p, frequency)`` aggregates the weights
    directly — the oracle proves the semantics by materializing the
    expanded multiset (unnest × quantity) and taking the plain
    percentile: identical by definition, exact at round(6).

    Scale shape: single-pass partial-aggregated percentile state (value →
    weight map per partition) with NO row expansion — the oracle's
    explode-by-weight is the semantic definition, not the plan.
    """
    li = load(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("long")
    # weight contract (r13): frequencies are integral counts >= 1 — a
    # negative count crashed Spark's frequency check where DuckDB's
    # generate_series silently emitted nothing (crash-vs-wrong-answer);
    # sub-1 weights truncate to 0 units and are likewise weightless
    li = li.filter(w >= 1)
    # r13 opt (guide §2.5): the percentile aggregate funnels EVERY row
    # into |groups| (=3) reduce tasks that each build a value→weight
    # map. Collapsing to (group, value) weight sums first is exact
    # (frequency percentiles are invariant to merging equal values'
    # multiplicities — verified diff=0) and moves the bulk of the work
    # into a partial-aggregated full-width shuffle; the 3-task stage
    # then merges pre-summed pairs instead of raw rows.
    collapsed = (
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("val"))
        .agg(F.sum(w).alias("wt"))
    )
    return collapsed.groupBy("l_returnflag").agg(
        (F.round(F.percentile("val", F.lit(0.5), F.col("wt")), 6)
         + F.lit(0.0)).alias("wmedian"),
        (F.round(F.percentile("val", F.lit(0.9), F.col("wt")), 6)
         + F.lit(0.0)).alias("wp90"),
    )


@query(
    "q_incremental_agg",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2)))
                         AS DECIMAL(30, 2)) AS VARCHAR) AS sum_price,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE)
                   / COUNT(*) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "incremental", "pipeline"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the per-priority order stats
    computed by MERGING two partial-aggregate states (orders before /
    since 1999) instead of one scan — the materialized-view refresh
    pattern (base partial + delta partial → re-aggregate) that turns a
    100 TB daily rollup into an O(delta) job. The oracle computes the
    same aggregate flat, so the hash proves merge(partials) ≡ full for
    every algebraic aggregate here (count/sum/min/max; avg derived from
    merged sum/count at the END — averaging averages would be wrong).

    DETERMINISM: money sums in exact decimal (module rule); the derived
    average is one double division of exactly-agreed operands.

    Scale shape: in production the base partial is a STORED table —
    only the delta side scans raw; the merge itself is a |groups|-row
    union + re-aggregation, trivially partial-agged.
    """
    o = load(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(30,2)").alias("s"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    # EXHAUSTIVE split (r12 null-stress sweep): `< cut` / `>= cut` are
    # NOT complements once o_orderdate is nullable — a NULL-dated order
    # failed both filters and silently vanished from the merged view
    # while the oracle's flat aggregate kept it. NULL-dated rows belong
    # to the DELTA partial (unplaceable in the closed historical base).
    base = partial(o.filter(F.col("o_orderdate") < cut))
    delta = partial(o.filter((F.col("o_orderdate") >= cut)
                             | F.col("o_orderdate").isNull()))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            F.sum("s").cast("decimal(30,2)").alias("s_dec"),
            F.min("mn").alias("min_price"),
            F.max("mx").alias("max_price"),
        )
        .select(
            "o_orderpriority", "n_orders",
            F.col("s_dec").cast("string").alias("sum_price"),
            "min_price", "max_price",
            (F.col("s_dec").cast("double") / F.col("n_orders"))
            .alias("avg_price"),
        )
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "distinct", "bitmap", "sketch"),
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct via bitmap rollup — q_agg_sketch_merge's
    two-level shape (daily partials → merged global) with bitmaps
    instead of HLL: per-(type, day, bucket) bitmaps OR-merge losslessly,
    so the pre-aggregated rollup answers any date-range distinct count
    EXACTLY (the countDistinct expand-shuffle never touches raw twice).
    The bitmap/HLL pair is the exact-vs-approximate tradeoff at a
    glance: bitmaps cost O(id-range/8) bytes per group, HLL a fixed few
    KB with ~1.6% error.

    Scale shape: bitmap_bucket_number shards the id space so each
    bitmap is a bounded 4 KB chunk; all three levels partial-aggregate;
    the oracle's plain COUNT(DISTINCT) proves the rollup exact.
    """
    e = load(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.date_trunc("day", "ts").alias("d"),
                 F.expr("bitmap_bucket_number(user_id)").alias("bk"),
                 F.expr("bitmap_bit_position(user_id)").alias("bp"))
        .groupBy("event_type", "d", "bk")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("b"))
    )
    merged = (
        daily.groupBy("event_type", "bk")
        .agg(F.expr("bitmap_or_agg(b)").alias("b"))
    )
    return (
        merged.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(b)")).cast("long").alias("n_users"))
    )


@query(
    "q_agg_gini",
    oracle="""
        WITH r AS (
            SELECT o_orderpriority,
                   CAST(o_totalprice AS DECIMAL(18, 2)) AS x,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey) AS i,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM orders
            WHERE o_totalprice IS NOT NULL
        )
        SELECT o_orderpriority,
               CAST(MAX(n) AS BIGINT) AS n_orders,
               round(CAST(SUM((2 * i - n - 1) * x) AS DOUBLE)
                     / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6)
                   AS gini
        FROM r GROUP BY o_orderpriority
    """,
    tags=("agg", "stats", "inequality"),
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order values per priority class — the
    concentration/inequality statistic (is revenue dominated by a few
    whale orders?), via the sorted rank-weighted identity
    G = Σ(2i − n − 1)xᵢ / (n·Σx).

    DETERMINISM: prices as exact DECIMAL, ranks as exact integers — both
    sums are exact decimal (rank-weighted included), so the single
    double division at the end rounds identically; the rank order is
    fully tie-broken.

    Scale shape: ONE shuffle on the group key serves the rank window,
    the count window, and the final aggregate (same partitioning
    throughout); nothing quadratic — the textbook Gini via mean absolute
    difference is O(n²) per group.

    NULL CONTRACT (r12): Gini is a statistic OF the order values — a
    NULL-priced order has no magnitude to concentrate and is excluded
    from both rank and n on BOTH sides (leaving it in would shift every
    rank by the engines' differing null sort position AND dilute n with
    valueless rows).
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull())
    wr = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.round(
                # i cast LONG before the doubling (r9 review: row_number
                # is 32-bit, so 2*i overflows int at >2^30 rows per
                # class — ANSI raises — while the oracle's BIGINT math
                # is correct; n is already long via the count window)
                F.sum((2 * F.col("i").cast("long") - F.col("n") - 1)
                      * F.col("x"))
                .cast("double")
                / (F.max("n").cast("double")
                   * F.sum("x").cast("double")), 6).alias("gini"),
        )
    )


@query(
    "q_join_asof_forward",
    oracle="""
        -- p pre-deduped to ONE purchase per (user, ts) — MIN event_id,
        -- the Spark side's first()-over-ascending tie-break (see
        -- q_join_asof's oracle note on DuckDB ASOF tie nondeterminism)
        WITH c AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type = 'click'),
             p AS (SELECT user_id, ts, MIN(event_id) AS event_id
                   FROM events WHERE event_type = 'purchase'
                   GROUP BY user_id, ts)
        SELECT c.event_id AS click_id,
               c.user_id  AS user_id,
               c.ts       AS click_ts,
               p.event_id AS next_purchase_id,
               p.ts       AS next_purchase_ts
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts < p.ts
    """,
    tags=("join", "asof"),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click attached to the user's earliest
    strictly-later purchase (time-to-conversion attribution; NULL if
    never converted) — the mirror of q_join_asof's backward lookup,
    with the same union-plus-ordered-scan formulation run in reverse:
    ``first(purchase) over (rows 1 following → unbounded)``.

    Ordering (ts, kind, event_id) with purchases sorted BEFORE clicks
    at equal ts keeps the inequality strict under timestamp collisions; cost is ONE shuffle on
    user_id regardless of per-user event counts (the naive range join
    explodes O(clicks × purchases) per user). Oracle: DuckDB's native
    forward ASOF (c.ts < p.ts picks the smallest later p.ts).
    """
    e = load(spark, sf_dir, "events")
    # kind: purchase=0 sorts BEFORE click=1 at equal ts, so a click's
    # strictly-following frame can never see an equal-ts purchase (the
    # strict < would otherwise silently weaken to <= on ts collisions).
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("struct<ts:timestamp_ntz,event_id:bigint>")
         .alias("purchase"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("kind"),
        F.struct("ts", "event_id").alias("purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("nxt", F.first("purchase", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("nxt.event_id").alias("next_purchase_id"),
            F.col("nxt.ts").alias("next_purchase_ts"),
        )
    )


@query(
    "q_agg_mad",
    oracle="""
        WITH ev AS (SELECT * FROM events
                    WHERE abs(value) < 9.0e11),  -- measure domain (r13)
        med AS (
            SELECT event_type,
                   percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
            FROM ev GROUP BY event_type
        )
        SELECT e.event_type,
               round(MAX(med.med), 6) + 0.0 AS median_value,
               round(percentile_cont(0.5) WITHIN GROUP (
                   ORDER BY abs(e.value - med.med)), 6) + 0.0 AS mad
        FROM ev e JOIN med USING (event_type)
        GROUP BY e.event_type
    """,
    tags=("agg", "stats", "robust"),
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    estimator (50% breakdown point) behind outlier scoring where
    stddev itself is corrupted by the outliers it should find
    (q_events_anomaly_zscore's 3σ rule becomes |x−med| > k·MAD).

    DETERMINISM: two exact interpolated percentiles; the deviation is
    one subtraction+abs on identical doubles; both emitted 6dp.

    Scale shape: two passes over the fact table (medians are not
    mergeable, so the second pass needs the first's result — broadcast
    back as a |groups|-row table); each pass is one grouped exact
    percentile. At 100 TB both become approx_percentile sketches and
    the two passes fuse into one.
    """
    e = load(spark, sf_dir, "events").filter(measure_domain("value"))
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            (F.round(F.max("med"), 6) + F.lit(0.0))
            .alias("median_value"),
            (F.round(F.percentile(F.abs(F.col("value") - F.col("med")),
                                  F.lit(0.5)), 6) + F.lit(0.0))
            .alias("mad"),
        )
    )
