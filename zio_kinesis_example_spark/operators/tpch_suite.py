"""TPC-H decision-support suite, adapted to the testdata's column subset.

Extends the q_tpch_q3/q5/q6/q18 + q_agg_group(Q1) set already registered
with the remaining queries expressible over the generated schema
(TESTDATA.md). The testdata has no ``partsupp`` table and lineitem lacks
commitdate/receiptdate/shipmode/shipinstruct, so:

- Q2/Q11 (partsupp-only semantics) are out of scope; Q16/Q20 use the
  distinct ``(l_partkey, l_suppkey)`` pairs of lineitem as the partsupp
  stand-in (the supply relation actually observed in the fact table).
- Q4/Q21's lateness predicate is re-based on ``l_shipdate`` vs
  ``o_orderdate`` (the two dates that exist).
- Q8/Q9/Q14/Q17/Q19's part predicates use the generator's
  ``p_type``/``p_brand``/``p_name`` vocabularies.

The reference computes nothing relational (SURVEY.md §2.1 "does NOT
implement"); this suite is [north-star] batch coverage.

Determinism stance (the rule that keeps every oracle hash-exact):
- money sums that feed an ORDER BY/LIMIT cut or are emitted directly are
  computed in exact DECIMAL and emitted as strings (double sums reduce in
  engine-dependent order — q_tpch_q3's rule);
- ratios/averages are computed as ONE IEEE division of exactly-agreed
  numerator/denominator (decimal-sum → double, then divide), so both
  engines round identically;
- every top-k is fully tie-broken.

Scale stance: join graphs are declared, not scheduled — Catalyst + AQE
reorder and pick broadcast vs shuffle from actual sizes; fixed dims
(region, nation) are broadcast explicitly; aggregations rely on partial
aggregation so post-join shuffles carry ≤ |groups|×|partitions| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .exact import (
    SQL_MONEY, SQL_REV, dec_avg_double, dec_sum_double, measure_domain,
    money_term,
    rev_str, ts_lit,
)


@query(
    "q_tpch_q4",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), lateness re-based on
    l_shipdate > o_orderdate (no commit/receipt dates in the testdata).

    Scale shape: the quarter filter prunes orders at the scan; the EXISTS
    executes as a left-semi hash join on orderkey with the non-equi date
    comparison evaluated inside the join — lineitem is streamed once,
    never materialized per-order. 5 output groups → the final shuffle is
    partial-aggregated to nothing.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, (F.col("l_orderkey") == F.col("o_orderkey"))
               & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q7",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(date_part('year', l_shipdate) AS INT) AS l_year,
               {SQL_REV} AS revenue
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n1.n_name, n2.n_name, date_part('year', l_shipdate)
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations by
    ship year — the double-dimension-alias join shape (nation joined twice
    under different roles).

    Scale shape: both nation sides broadcast (25 rows), and the
    nation-pair OR-predicate collapses each side to 2 rows BEFORE the fact
    joins, so supplier and customer shrink by ~12.5× at their hash joins.
    The big join chain shuffles on its natural keys; 2×2×2 output groups.
    """
    n = load(spark, sf_dir, "nation")
    n1 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1996-01-01"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01"))
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(rev_str(money_term()).alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                             ELSE CAST(0 AS DECIMAL(30, 8)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(date_part('year', o_orderdate) AS INT) AS o_year,
                   CAST({SQL_MONEY} AS DECIMAL(30, 8)) AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE'
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) AS all_sales
        GROUP BY o_year
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one supplier nation's share of
    ECONOMY-part revenue sold into one region, by order year — the
    conditional-numerator ratio over an 8-table join.

    DETERMINISM: numerator and denominator are exact DECIMAL sums; the
    share is ONE double division of exactly-agreed operands, so both
    engines round identically (module rule).

    Scale shape: region⋈nation broadcasts to a ≤25-row customer-side
    filter; the p_type filter prunes part before its join; supplier's
    nation lookup broadcasts. Fact joins shuffle on their keys once.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1998-01-01"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_nations = (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    supp_nation = n.select(F.col("n_nationkey").alias("s_nkey"),
                           F.col("n_name").alias("nation"))
    vol = money_term().cast("decimal(30,8)")
    sales = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(eur_nations), F.col("c_nationkey") == F.col("c_nkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"),
                "nation")
    )
    zero = F.lit(0).cast("decimal(30,8)")
    return sales.groupBy("o_year").agg(
        (F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume"))
               .otherwise(zero)).cast("double")
         / F.sum("volume").cast("double")).alias("mkt_share")
    )


@query(
    "q_tpch_q9",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(date_part('year', o_orderdate) AS INT) AS o_year,
               {SQL_REV} AS sum_profit
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, date_part('year', o_orderdate)
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: profit reduces to revenue
    because the testdata has no partsupp.ps_supplycost — the join graph
    (part-name filter fanning across every fact row, grouped by supplier
    nation × order year) is the point.

    Scale shape: the LIKE filter prunes part before the fact join (name
    predicates reach the scan); nation broadcasts; orders joins on
    orderkey to supply the year. 25 × |years| output groups.
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(rev_str(money_term()).alias("sum_profit"))
    )


@query(
    "q_tpch_q10",
    oracle=f"""
        SELECT c_custkey, c_name, {SQL_REV} AS revenue,
               c_acctbal, n_name, c_mktsegment
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
        ORDER BY SUM({SQL_MONEY}) DESC, c_custkey
        LIMIT 20
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top-20 customers by revenue
    lost to returns in one quarter.

    Scale shape: quarter + returnflag filters reach both fact scans;
    nation broadcasts. The top-20 rides TakeOrderedAndProject on the
    EXACT decimal revenue (per-partition 20-row heaps, no global sort),
    tie-broken on c_custkey.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1997-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.sum(money_term()).cast("decimal(30,8)").alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name",
                F.col("rev_dec").cast("string").alias("revenue"),
                "c_acctbal", "n_name", "c_mktsegment")
    )


@query(
    "q_tpch_q13",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) AS c_orders
        GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): how many customers
    placed k orders — the left-join-preserving count histogram (customers
    with zero qualifying orders MUST appear in the k=0 bucket).

    Scale shape: left outer hash join on custkey with the priority filter
    applied to the orders side pre-join (filters on the preserved side's
    partner push INTO the join input, not below the outer join); COUNT of
    the join's right key counts non-NULLs, so zero-order customers fall
    out as c_count=0 without a separate anti pass. Second aggregation is
    over |distinct counts| rows — negligible.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_tpch_q14",
    oracle=f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                     THEN CAST({SQL_MONEY} AS DECIMAL(30, 8))
                                     ELSE CAST(0 AS DECIMAL(30, 8)) END)
                            AS DOUBLE)
                     / CAST(SUM(CAST({SQL_MONEY} AS DECIMAL(30, 8)))
                            AS DOUBLE) AS promo_revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO-part revenue share in one ship
    month — the ungrouped conditional-ratio aggregate.

    DETERMINISM: both sums exact decimal; share = single double division
    then one multiply by 100.0 — identical rounding on both engines.

    Scale shape: the month filter reaches the lineitem scan and kills
    ~97% of the fact table before the part join; the whole result is one
    row via partial aggregation (no groupBy shuffle at all — a single
    final-merge exchange of one partial row per partition).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1997-03-01"))
        & (F.col("l_shipdate") < ts_lit("1997-04-01"))
    )
    p = load(spark, sf_dir, "part")
    vol = money_term().cast("decimal(30,8)")
    zero = F.lit(0).cast("decimal(30,8)")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (F.lit(100.0)
             * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
                .cast("double")
             / F.sum(vol).cast("double")).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({SQL_MONEY}) AS DECIMAL(30, 8)) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS VARCHAR) AS total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    revenue — the view-then-scalar-max shape (ties included, so the
    result set is deterministic without a limit).

    DETERMINISM: revenue is exact decimal, so the max and the equality
    against it are bit-exact — a double max can tie-break differently
    per engine.

    Scale shape: one partial-aggregated shuffle builds the per-supplier
    view; the scalar MAX reduces it to one broadcast row; the equality
    filter + supplier join then touch |suppliers| rows once. No global
    sort, no window over a single partition.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1997-01-01"))
        & (F.col("l_shipdate") < ts_lit("1997-04-01"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(money_term()).cast("decimal(30,8)").alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("max_rev"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("string").alias("total_revenue"))
    )


@query(
    "q_tpch_q16",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) AS ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part-supplier relationship count), with the observed
    distinct (l_partkey, l_suppkey) pairs standing in for partsupp
    (module docstring): distinct suppliers per qualifying brand/type/size.

    Scale shape: NOT-IN/exclusion predicates prune part before its join;
    the distinct-pairs projection is a partial-aggregated shuffle on the
    pair key, then countDistinct runs its expand+two-phase plan over the
    joined result. Everything shuffles at most once per phase.
    """
    li = load(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        ps.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17",
    oracle="""
        SELECT CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) < 9.0e11
                         THEN l_extendedprice END AS DECIMAL(18, 4)))
                    AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#7'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue of lineitems
    below 20% of their part's average quantity, one brand — the
    correlated-aggregate-subquery shape, de-correlated into a per-part
    aggregate join.

    DETERMINISM: quantities are integer-valued doubles, so per-part
    AVG = exact-sum / exact-count and the 0.2× threshold round
    identically on both engines; the price sum is exact decimal with ONE
    final double division by 7.0.

    Scale shape: the brand filter prunes part at the scan; lineitem is
    reduced by a SEMI join against those parts BEFORE the per-part
    average (the subquery only ever needs averages for brand parts), so
    the threshold aggregate runs over the reduced set and broadcasts.
    The physical plan scans lineitem TWICE (the threshold branch and
    the probe branch each carry their own broadcast-semi-joined scan —
    Spark has no subplan reuse below an exchange here); both scans are
    brand-pruned by the pushed semi join, which is the win over the
    naive correlated form's once-per-part evaluation. (r8 review: an
    earlier docstring claimed a single scan.)
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#7")
    pkeys = p.select("p_partkey")
    # NO forced broadcast (r9 review): the brand key set and per-part
    # thresholds grow linearly with |part| (~4% of it), unlike the
    # fixed-size nation/region dims the module broadcasts explicitly —
    # AQE broadcasts them while they fit and degrades gracefully to a
    # shuffle join at the 100 TB posture instead of OOMing the driver.
    li = (
        load(spark, sf_dir, "lineitem")
        .join(pkeys, F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
    )
    thr = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr"))
    )
    return (
        li.join(thr, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg((dec_sum_double("l_extendedprice")
              / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q_tpch_q19",
    oracle=f"""
        SELECT {SQL_REV} AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three OR'd brand/size/quantity
    brackets spanning both join sides — the disjunctive-predicate join.

    Scale shape: the OR can't push below the join as-is, so the IMPLIED
    single-side conjuncts are applied manually pre-join (p_brand ∈ {{3
    brands}} ∧ p_size ≤ 15 on part; l_quantity ≤ 30 on lineitem) — the
    derivable-residual trick optimizers call 'OR-predicate factoring';
    the full bracket predicate then evaluates inside the hash join.
    Single-row output via partial aggregation.
    """
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & (F.col("p_size") <= 15) & (F.col("p_size") >= 1)
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(rev_str(money_term()).alias("revenue"))
    )


@query(
    "q_tpch_q20",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '%red%'
              AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 200.0
        )
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted to shipped volumes
    (no partsupp.availqty): suppliers who shipped > 200 units of
    red-named parts in one year — the IN-over-grouped-HAVING semi-join
    chain.

    Scale shape: name LIKE prunes part at the scan; the year filter
    prunes lineitem; the HAVING aggregate collapses to |qualifying
    suppliers| rows which then drive a left-semi hash join against
    supplier. Quantity sums are exact (integer-valued doubles).
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1997-01-01"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01"))
    )
    qual = (
        # no forced broadcast: '%red%' parts are ~5% of |part| — SF-
        # proportional, so the strategy stays AQE's (the Q17 rationale)
        li.join(p.select("p_partkey"),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200.0)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q_tpch_q21",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), lateness re-based
    on l_shipdate > o_orderdate + 60 days: for finished orders, count a
    supplier's late lineitems where it was the ONLY late supplier in a
    multi-supplier order.

    The oracle states the classic EXISTS / NOT-EXISTS pair; this side
    states the distributed equivalent: ONE conditional aggregation pass
    per order (distinct suppliers ≥ 2 ∧ distinct LATE suppliers = 1),
    which needs a single shuffle on orderkey instead of the oracle's two
    correlated self-joins of the fact table — the classic Q21 rewrite.
    When exactly one supplier is late, min(late supplier) IS that
    supplier, and the late-lineitem count all belongs to it.

    Scale shape: lineitem shuffles once on orderkey (the orders join and
    all three logical self-references ride it); the per-order aggregate
    emits ≤1 row per order; the top-20 is TakeOrderedAndProject.

    GROUPING KEY = s_name, exactly as the oracle (and TPC-H) declare —
    found by the r11 10×-proxy value-parity sweep: the previous form
    grouped by suppkey and only then joined names, which agrees with
    the oracle ONLY while s_name is unique per key (true in the
    fixtures, violated by the key-island proxy, and not something the
    query should assume about arbitrary data). The per-suppkey
    pre-aggregate below keeps the shuffle supplier-sized; the final
    name-group is over ≤ |supplier| rows.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late_items"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    s = load(spark, sf_dir, "supplier")
    return (
        per_order.groupBy("late_supp")
        .agg(F.sum("n_late_items").alias("pre_numwait"))
        .join(s, F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.sum("pre_numwait").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "q_tpch_q22",
    oracle="""
        WITH avg_bal AS (
            -- measure-domain guard mirrors exact.dec_avg_double (r13)
            SELECT CAST(SUM(CAST(CASE WHEN abs(c_acctbal) < 9.0e11
                             THEN c_acctbal END AS DECIMAL(18, 2)))
                        AS DOUBLE) / COUNT(*) AS a
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(CAST(SUM(CAST(CASE WHEN abs(c_acctbal) < 9.0e11
                             THEN c_acctbal END AS DECIMAL(18, 2)))
                         AS DECIMAL(30, 2)) AS VARCHAR) AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > a
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c_nationkey
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), keyed on nation instead of
    phone prefix (no c_phone in the testdata): rich customers with no
    recent orders, counted per nation.

    DETERMINISM: the average-balance threshold is an exact decimal sum
    divided once as double (module rule) so the '>' cut agrees bit-for-bit;
    balances are summed in decimal and emitted as strings.

    Scale shape: the scalar subquery becomes a one-row broadcast; the
    NOT EXISTS is a left-anti hash join against date-filtered orders
    (the filter pushes to the orders scan, shrinking the anti build
    side); one final 25-group aggregate.
    """
    c = load(spark, sf_dir, "customer")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(dec_avg_double("c_acctbal", dp=2).alias("a"))
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= ts_lit("1999-01-01")).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.when(measure_domain("c_acctbal"),
                         F.col("c_acctbal")).cast("decimal(18,2)"))
            .cast("decimal(30,2)").cast("string").alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q2",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        eur AS (
            SELECT s_suppkey, s_acctbal, s_name, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        cand AS (
            SELECT p_partkey, p_name, p_brand,
                   s_suppkey, s_acctbal, s_name, n_name
            FROM part
            JOIN ps ON p_partkey = l_partkey
            JOIN eur ON l_suppkey = s_suppkey
            WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 30
        ),
        best AS (SELECT p_partkey, MAX(s_acctbal) AS mb
                 FROM cand GROUP BY p_partkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, p_brand
        FROM cand JOIN best USING (p_partkey)
        WHERE s_acctbal = mb
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: best-account-balance
    European supplier per qualifying part, over the observed
    (l_partkey, l_suppkey) supply pairs (module docstring: ps_supplycost
    does not exist, so MAX(s_acctbal) stands in for MIN(ps_supplycost) —
    the correlated-extremum-per-part join shape is identical).

    DETERMINISM: the extremum is a MAX over stored doubles (selection,
    no arithmetic) and every tie is broken (n_name, s_name, p_partkey),
    so the equality filter and top-100 cut are engine-exact.

    Scale shape: region⋈nation broadcast-prunes supplier BEFORE the pair
    join; the per-part max is a partial-agged groupBy re-joined on
    p_partkey (the classic correlated-subquery de-correlation); AQE
    picks the join strategy for the |parts|-sized best set.
    """
    ps = (load(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct())
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(
            n.join(F.broadcast(r),
                   F.col("n_regionkey") == F.col("r_regionkey"))
            .select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 30))
    cand = (
        p.join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(eur, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "p_brand",
                "s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.max("s_acctbal").alias("mb"))
    return (
        cand.join(best, (F.col("p_partkey") == F.col("b_partkey"))
                  & (F.col("s_acctbal") == F.col("mb")))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select("s_acctbal", "s_name", "n_name",
                "p_partkey", "p_name", "p_brand")
    )


@query(
    "q_tpch_q11",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        v AS (
            SELECT n_name,
                   CAST(SUM(CAST(CASE WHEN abs(p_retailprice) < 9.0e11
                            THEN p_retailprice END AS DECIMAL(18, 4)))
                        AS DECIMAL(30, 4)) AS val
            FROM ps
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        ),
        tot AS (SELECT CAST(SUM(val) AS DECIMAL(30, 4)) AS tv FROM v)
        SELECT n_name, CAST(val AS VARCHAR) AS value
        FROM v, tot
        WHERE val * 25 > tv
    """,
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: per-nation
    'inventory value' = Σ p_retailprice over the observed supply pairs
    (no ps_supplycost/availqty), keeping nations holding > 4% of total —
    the aggregate-vs-global-scalar-threshold shape.

    DETERMINISM: the 4% threshold is compared as ``val × 25 > total``
    in EXACT decimal — the textbook ``val > total * 0.0001`` form
    multiplies a decimal by a double, whose result type and rounding are
    engine-specific.

    Scale shape: distinct pairs = one partial-agged shuffle; nation
    broadcast; the global total is a one-row broadcast back over the
    25-row per-nation aggregate.
    """
    ps = (load(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct())
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    v = (
        ps.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.when(measure_domain("p_retailprice"),
                          F.col("p_retailprice")).cast("decimal(18,4)"))
             .cast("decimal(30,4)").alias("val"))
    )
    tot = v.agg(F.sum("val").cast("decimal(30,4)").alias("tv"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val") * 25 > F.col("tv"))
        .select("n_name", F.col("val").cast("string").alias("value"))
    )


@query(
    "q_tpch_q12",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > o_orderdate
        GROUP BY l_returnflag
    """,
    tags=("join", "agg", "tpch"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority split), adapted: l_returnflag
    stands in for the absent l_shipmode, lateness for the commit/receipt
    comparison — counts of high- vs low-priority orders per flag among
    late-shipped lineitems (the conditional dual-count join).

    Scale shape: the year filter reaches the lineitem scan; the
    late-ship predicate rides the orderkey hash join as its residual;
    both counts come from ONE pass (two conditional sums, partial-agged
    to 3 groups).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1997-01-01"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01"))
    )
    o = load(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, (F.col("o_orderkey") == F.col("l_orderkey"))
               & (F.col("l_shipdate") > F.col("o_orderdate")))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
    )
