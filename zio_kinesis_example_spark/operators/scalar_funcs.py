"""Scalar-function query inventory: string / date / math / array / map /
json (SURVEY.md §2.2 function rows).

The reference's only scalar computation is JSON encode/decode + string
interpolation (TestMsgJsonSerde.scala:17-26, TestUtils.scala:43,80); the
json query here mirrors that serde surface over ``events.props``; the rest
is the north-star function surface.

Every expression stays JVM-side (built-in ``pyspark.sql.functions``) so the
whole projection compiles into one WholeStageCodegen span — no Python on
the hot path.

Type-alignment notes (Spark ↔ DuckDB oracle):
- Spark length/size/instr → INT, DuckDB → BIGINT: oracle casts to INT.
- Spark ceil/floor → BIGINT, DuckDB → DOUBLE: oracle casts to BIGINT.
- Spark year/month/day → INT, DuckDB → BIGINT: oracle casts to INT.
- DuckDB time_bucket(INTERVAL 1 MONTH, ts) → DATE; Spark F.trunc → DATE: aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from .exact import measure_domain


@query(
    "q_str_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               substring(p_name, 1, 8) AS name_prefix,
               CAST(length(p_name) AS INT) AS name_len,
               concat_ws('-', p_brand, p_type) AS brand_type,
               (p_name LIKE '%a%') AS has_a,
               regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
               regexp_replace(p_name, ' ', '_', 'g') AS name_underscored,
               CAST(strpos(p_name, 'e') AS INT) AS first_e_pos
        FROM part
    """,
    tags=("function", "string"),
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part names."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_underscored"),
        F.instr("p_name", "e").alias("first_e_pos"),
    )


@query(
    "q_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS order_year,
               CAST(month(o_orderdate) AS INT) AS order_month,
               CAST(time_bucket(INTERVAL 1 MONTH, o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
                   AS days_since_epoch_start,
               CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow
        FROM orders
    """,
    tags=("function", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp function battery over o_orderdate (timestamp_ntz).

    DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday → oracle adds 1.
    Day-resolution results are returned as naive midnight TIMESTAMPs on
    both sides (pandas/arrow represent DATE and TIMESTAMP differently per
    engine; timestamps normalize identically).
    """
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.trunc(d, "month").cast("timestamp_ntz").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01")).alias("days_since_epoch_start"),
        F.date_add(d.cast("date"), 30).cast("timestamp_ntz").alias("due_date"),
        F.last_day(d.cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.dayofweek(d).alias("dow"),
    )


@query(
    "q_math_funcs",
    oracle="""
        -- function-domain guards (r13 numeric sweep): sqrt(neg)
        -- CRASHES DuckDB but is NaN in Spark, ln(<=0) likewise —
        -- each is stated as a CASE so an out-of-domain input yields
        -- NULL on BOTH engines; round + 0.0 is the sign-bit rule
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1) + 0.0 AS price_round1,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(ceil(l_extendedprice / 100) AS BIGINT) AS price_ceil_h,
               CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_floor_h,
               CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END
                   AS qty_sqrt,
               CASE WHEN l_extendedprice > 0 THEN ln(l_extendedprice) END
                   AS price_ln,
               pow(1 + l_tax, 2) AS tax_sq
        FROM lineitem
    """,
    tags=("function", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over lineitem prices."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(F.col("l_extendedprice"), 1) + F.lit(0.0))
        .alias("price_round1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 100).alias("price_ceil_h"),
        F.floor(F.col("l_extendedprice") / 100).alias("price_floor_h"),
        F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity"))
        .alias("qty_sqrt"),
        F.when(F.col("l_extendedprice") > 0,
               F.log(F.col("l_extendedprice"))).alias("price_ln"),
        F.pow(1 + F.col("l_tax"), 2).alias("tax_sq"),
    )


@query(
    "q_array_funcs",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_terms,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT)
                   AS n_distinct_terms,
               list_contains(string_split(text, ' '), 'scan') AS has_scan,
               list_sort(string_split(text, ' '))[1] AS first_term_sorted,
               array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
                   AS distinct_terms_sorted
        FROM documents
    """,
    tags=("function", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery: split → size/contains/distinct/sort.

    collect_list-style aggregation lives in q_map_funcs/q_text_tokens; here
    the arrays are per-row. sort_array makes every array deterministic, and
    the array column is serialized to a space-joined string so the result is
    hashable by any downstream canonicalizer (array cells crash pandas sorts).
    """
    d = load(spark, sf_dir, "documents")
    terms = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(terms).alias("n_terms"),
        F.size(F.array_distinct(terms)).alias("n_distinct_terms"),
        F.array_contains(terms, "scan").alias("has_scan"),
        F.element_at(F.sort_array(terms), 1).alias("first_term_sorted"),
        F.array_join(F.sort_array(F.array_distinct(terms)), " ").alias(
            "distinct_terms_sorted"
        ),
    )


@query(
    "q_map_funcs",
    oracle="""
        WITH c AS (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            WHERE event_type IS NOT NULL
            GROUP BY user_id, event_type
        )
        SELECT user_id,
               to_json(map_from_entries(
                   list_sort(list(struct_pack(k := event_type, v := n)))
               )) AS type_counts_json,
               array_to_string(list_sort(list(event_type)), ' ') AS event_types
        FROM c GROUP BY user_id
    """,
    tags=("function", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction: per-user event_type→count map.

    Entries are sorted by key before map construction on BOTH sides so the
    JSON rendering (insertion-ordered in each engine) is identical. The
    event_types list is serialized to a space-joined string (array-typed
    output cells are unhashable in a pandas canonicalizer).

    NULL CONTRACT (r12): a NULL event_type cannot key a map — Spark
    RAISES NULL_MAP_KEY where DuckDB silently accepts it — so null-typed
    rows contribute no entry on either side (and stay out of the types
    list too: collect_list skips nulls, DuckDB's list() keeps them — the
    filter removes both divergences at the source).
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull())
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("user_id").agg(
        F.to_json(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            )
        ).alias("type_counts_json"),
        F.array_join(F.sort_array(F.collect_list("event_type")), " ").alias(
            "event_types"
        ),
    )


@query(
    "q_json_funcs",
    oracle="""
        -- TRY_CAST gated on JSON INTEGER types (r9 review): a plain
        -- CAST RAISED on a non-numeric k where Spark's from_json('k
        -- INT') yields NULL; it also coerced quoted numerics ('"5"')
        -- and would round JSON doubles — both of which from_json NULLs.
        -- The integer-type gate + TRY_CAST matches Spark's
        -- failure -> NULL contract on every axis.
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                    THEN TRY_CAST(json_extract_string(props, '$.k') AS INT)
               END AS k_int,
               (CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                     THEN TRY_CAST(json_extract_string(props, '$.k') AS INT)
                END % 10) AS k_mod
        FROM events
    """,
    tags=("function", "json"),
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props — the Spark mirror of the
    reference's typed JSON decode (TestMsgJsonSerde.scala:17-23: parse →
    typed field access, failure → null rather than crash)."""
    e = load(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    k_int = F.from_json(F.col("props"), "k INT").getField("k")
    return e.select(
        "event_id",
        k_str.alias("k_str"),
        k_int.alias("k_int"),
        (k_int % 10).alias("k_mod"),
    )


@query(
    "q_null_funcs",
    oracle="""
        SELECT o_orderkey,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
               CASE WHEN o_totalprice IS NULL THEN -1.0
                    ELSE o_totalprice END AS price_nn,
               (o_custkey IS NOT NULL) AS has_cust,
               IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'same')
                   AS always_same
        FROM orders
    """,
    tags=("function", "null"),
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling function family: coalesce/nullif/ifnull/IS NOT NULL.
    All are codegen'd null-check branches — zero-cost at scale, but the
    semantics (SQL three-valued logic) must match the oracle exactly."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN"))
         .alias("status_norm"),
        F.when(F.col("o_totalprice").isNull(), -1.0)
         .otherwise(F.col("o_totalprice")).alias("price_nn"),
        F.col("o_custkey").isNotNull().alias("has_cust"),
        F.ifnull(F.nullif("o_orderpriority", F.col("o_orderpriority")),
                 F.lit("same")).alias("always_same"),
    )


@query(
    "q_bitwise_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_orderkey & 255 AS and_mask,
               l_orderkey | 7 AS or_low,
               xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS xored,
               l_orderkey << 2 AS shifted_l,
               l_orderkey >> 3 AS shifted_r,
               CAST(bit_count(l_orderkey) AS INT) AS popcount
        FROM lineitem
    """,
    tags=("function", "bitwise"),
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family (and/or/xor/shifts/popcount) — the
    building blocks the dedup signature operators are made of."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("and_mask"),
        F.col("l_orderkey").bitwiseOR(F.lit(7)).alias("or_low"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long"))
         .alias("xored"),
        F.shiftleft("l_orderkey", 2).alias("shifted_l"),
        F.shiftright("l_orderkey", 3).alias("shifted_r"),
        F.bit_count("l_orderkey").alias("popcount"),
    )


@query(
    "q_struct_funcs",
    oracle="""
        SELECT c_custkey,
               to_json({'nation': c_nationkey, 'segment': c_mktsegment})
                   AS profile_json,
               {'nation': c_nationkey, 'segment': c_mktsegment}.nation
                   AS nation_again,
               -- + 0.0: round(-0.0) renders '-0' in DuckDB and '0'
               -- in Spark (the r4 sign-bit rule, r13 numeric sweep)
               CAST(round(struct_extract(
                   {'bal': c_acctbal, 'double_bal': c_acctbal * 2},
                   'double_bal'), 6) + 0.0 AS DOUBLE) AS double_bal
        FROM customer
    """,
    tags=("function", "struct"),
)
def q_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction and field extraction (nested-type surface:
    build, project, compute through). Nested structs are columnar all the
    way down in parquet/Arrow — no row materialization cost. The struct
    itself is serialized with to_json for output: a raw struct column
    round-trips as Row-vs-dict depending on the reader's Arrow setting,
    so text is the portable comparison form (int/string fields only —
    float formatting would differ).

    NULL CONTRACT (r12): to_json keeps null fields explicitly
    (ignoreNullFields=false) — Spark's default silently DROPS a null
    struct field from the JSON while DuckDB renders "field":null,
    changing the document shape per row; a stable JSON schema is the
    intended semantics for a serialized profile."""
    c = load(spark, sf_dir, "customer")
    profile = F.struct(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    )
    return c.select(
        "c_custkey",
        F.to_json(profile, {"ignoreNullFields": "false"})
        .alias("profile_json"),
        profile.getField("nation").alias("nation_again"),
        F.round(
            F.struct(
                F.col("c_acctbal").alias("bal"),
                (F.col("c_acctbal") * 2).alias("double_bal"),
            ).getField("double_bal"), 6
        ).alias("double_bal"),
    )


@query(
    "q_tpch_q6",
    oracle="""
        -- guarded price at DECIMAL(19,4): the measure-domain rule +
        -- DuckDB's INT64 decimal multiply (see exact.SQL_MONEY, r13)
        SELECT CAST(SUM(CAST(CASE WHEN abs(l_extendedprice) < 9.0e11
                        THEN l_extendedprice END AS DECIMAL(19, 4))
                        * CAST(l_discount AS DECIMAL(8, 4))) AS DOUBLE)
                   AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "tpch"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    predicate-pushdown / scan-dominated query — every filter reaches
    PushedFilters, the aggregation is a two-value global state, and the
    whole thing is one codegen stage with zero shuffles (final agg of 1
    row). The benchmark anchor for scan efficiency."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # exact-decimal money product/sum (r8 review: a raw double
            # SUM reassociates in partition order — the repo's money
            # rule; DECIMAL(18,4)·(8,4) is exact for 2dp price × ≤4dp
            # discount), ONE cast to double at the end
            F.sum(F.when(measure_domain("l_extendedprice"),
                         F.col("l_extendedprice")).cast("decimal(18,4)")
                  * F.col("l_discount").cast("decimal(8,4)"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_regex_funcs",
    oracle="""
        -- TRY_CAST (r9 review): regexp_extract returns '' on a
        -- non-matching source and CAST('' AS INT) RAISES in DuckDB
        -- where the Spark side yields NULL — one stray source value at
        -- a new SF would crash the whole oracle query
        SELECT doc_id,
               TRY_CAST(regexp_extract(source, '([a-z]+)([0-9]+)', 2)
                        AS INT) AS src_num,
               regexp_matches(text, 'quick|lazy') AS mentions,
               regexp_replace(substring(text, 1, 30), '[aeiou]', '_', 'g')
                   AS devoweled
        FROM documents
    """,
    tags=("function", "regex"),
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function battery: group extraction, boolean match, global
    replace. Patterns are restricted to the common Java-regex/RE2 subset
    (character classes, alternation, groups) so both engines agree; all
    three run inside whole-stage codegen on the JVM."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        # try_cast: a non-matching source extracts '' and a plain cast
        # RAISES under ANSI (r9 review; mirrors the oracle's TRY_CAST)
        F.expr("try_cast(regexp_extract(source, '([a-z]+)([0-9]+)', 2) "
               "AS int)").alias("src_num"),
        F.col("text").rlike("quick|lazy").alias("mentions"),
        F.regexp_replace(F.substring("text", 1, 30), "[aeiou]", "_")
        .alias("devoweled"),
    )


@query(
    "q_explode_pos",
    oracle="""
        SELECT doc_id,
               CAST(unnest(generate_series(1, len(terms))) - 1 AS BIGINT)
                   AS pos,
               unnest(terms) AS term
        FROM (SELECT doc_id, string_split(text, ' ') AS terms
              FROM documents WHERE doc_id % 5 = 0)
    """,
    tags=("lateral", "explode"),
)
def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral positional explode (posexplode / unnest WITH ORDINALITY):
    every term of every 5th document with its 0-based position — the
    building block for positional n-grams and token alignment.

    Scale shape: explode is map-side row generation (no shuffle, no
    Python); the output is ~terms-per-doc × docs rows, so the 100 TB
    concern is OUTPUT volume, not the operator — downstream must
    aggregate or filter before any wide operation. The DuckDB oracle
    zips two unnests in lockstep to reproduce the ordinality.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "term")
