"""Text-analysis operators [north-star]: term frequencies, language ID,
quality scoring, token counting, document fingerprinting — all over the
``documents`` table, all JVM-side built-ins, all with exact DuckDB oracles.

Scale: every query here is scan → per-row expressions (+ at most one
grouped aggregation). No pairwise work, no Python. At 100 TB these are
single-pass map-mostly jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query

# Marker-term vocabularies for the n-gram/term-list language-ID heuristic.
# Deterministic toy lists over the corpus vocabulary; the *mechanism*
# (per-language marker scoring + argmax with alphabetical tie-break) is the
# operator under test, mirrored exactly in the oracle.
_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "nicht", "das", "table", "scan"),
    "en": ("the", "and", "a", "of", "join", "merge"),
    "es": ("el", "la", "los", "que", "filter", "row"),
    "fr": ("le", "la", "les", "des", "group", "sort"),
    "zh": ("de5", "shi4", "le5", "zai4", "hash", "batch"),
}
_LANGS = tuple(sorted(_MARKERS))


@query(
    "q_text_tokens",
    oracle="""
        WITH tf AS (
            SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        counts AS (
            SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
            FROM tf GROUP BY lang, term
        )
        SELECT lang, term, n, rnk FROM (
            SELECT lang, term, n,
                   CAST(row_number() OVER (PARTITION BY lang
                                           ORDER BY n DESC, term) AS BIGINT) AS rnk
            FROM counts
        ) WHERE rnk <= 5
    """,
    tags=("text",),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language by frequency (tie-break: term asc).

    tokenize → explode → grouped count → per-group top-k window. The
    explode happens map-side; the only shuffle is the (lang, term) agg.
    """
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("lang", "term", "n", "rnk")
    )


def _langid_score_sql_duck(lang: str) -> str:
    lst = ", ".join(f"'{t}'" for t in _MARKERS[lang])
    return (f"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), "
            f"[{lst}])) AS INT)")


def _langid_oracle() -> str:
    scores = ",\n".join(
        f"  {_langid_score_sql_duck(lang)} AS s_{lang}" for lang in _LANGS
    )
    # argmax with alphabetical tie-break: first lang whose score >= max of rest
    branches = []
    for i, lang in enumerate(_LANGS):
        rest = [f"s_{l}" for l in _LANGS[i + 1:]]
        if rest:
            cond = f"s_{lang} >= greatest({', '.join(rest)})" if len(rest) > 1 \
                else f"s_{lang} >= {rest[0]}"
            branches.append(f"WHEN {cond} THEN '{lang}'")
        else:
            branches.append(f"ELSE '{lang}'")
    case = "CASE " + " ".join(branches) + " END"
    return f"""
        WITH scored AS (
            SELECT doc_id, lang,
{scores}
            FROM documents
        )
        SELECT doc_id, {case} AS pred_lang,
               ({case} = lang) AS is_correct
        FROM scored
    """


@query("q_text_langid", oracle=_langid_oracle(), tags=("text",))
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-term language ID: per-language marker-hit count, argmax with
    alphabetical tie-break. The heuristic shape (n-gram/marker profile →
    score → argmax) is the standard fast lang-ID design; marker lists are
    deterministic constants shared with the oracle."""
    d = load(spark, sf_dir, "documents")
    terms = F.array_distinct(F.split("text", " "))
    scored = d.select(
        "doc_id",
        "lang",
        *[
            F.size(
                F.array_intersect(
                    terms, F.array(*[F.lit(t) for t in _MARKERS[lang]])
                )
            ).alias(f"s_{lang}")
            for lang in _LANGS
        ],
    )
    pred = None
    for lang in reversed(_LANGS):
        if pred is None:
            pred = F.lit(lang)
        else:
            rest = [F.col(f"s_{l}") for l in _LANGS if l > lang]
            mx = rest[0] if len(rest) == 1 else F.greatest(*rest)
            pred = F.when(F.col(f"s_{lang}") >= mx, F.lit(lang)).otherwise(pred)
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("is_correct"),
    )


#: ONE stopword vocabulary shared by q_text_quality's score (Spark +
#: oracle) and curation's q_curate_quality_gates battery (r8 review:
#: four literal copies could drift; the gate docstring calls itself
#: "the gate form of q_text_quality's scores").
STOPWORDS = ("the", "a", "and", "of")
_SQL_STOPS = "(" + ", ".join(f"'{t}'" for t in STOPWORDS) + ")"


@query(
    "q_text_quality",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_terms,
               n_chars,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS avg_term_len,
               round(CAST(len(list_filter(string_split(text, ' '),
                                          t -> t IN {_SQL_STOPS}))
                          AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS stopword_ratio,
               round(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 64)
                     * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                                          t -> t IN {_SQL_STOPS}))
                                   AS DOUBLE)
                              / len(string_split(text, ' '))), 6)
                   AS quality_score
        FROM documents
    """,
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length saturation × (1 − stopword
    ratio). Ratios are exact-int divisions → engine-identical; rounded 6dp."""
    d = load(spark, sf_dir, "documents")
    terms = F.split("text", " ")
    n_terms = F.size(terms).cast("long")
    n_alpha = F.length(F.regexp_replace("text", " ", "")).cast("double")
    stop = F.size(
        F.filter(terms, lambda t: t.isin(*STOPWORDS))
    ).cast("double")
    stop_ratio = stop / F.size(terms)
    return d.select(
        "doc_id",
        n_terms.alias("n_terms"),
        "n_chars",
        F.round(n_alpha / F.size(terms), 6).alias("avg_term_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(
            F.least(F.lit(1.0), F.size(terms).cast("double") / 64)
            * (1.0 - stop_ratio),
            6,
        ).alias("quality_score"),
    )


@query(
    "q_text_tokencount",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_text,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> length(t) > 4)) AS BIGINT)
                   AS n_long_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                    AS BIGINT) AS n_regex_tokens
        FROM documents
    """,
    tags=("text",),
)
def q_text_tokencount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace tokens, the chars/4 BPE-ish
    estimate (~4 chars/token heuristic), and a BPE-style regex tokenizer
    (letter runs | digit runs | single symbols — the simplified shape of
    the GPT-2 pretokenizer pattern, identical semantics in Java and RE2
    regex engines)."""
    d = load(spark, sf_dir, "documents")
    terms = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(terms).cast("long").alias("n_ws_tokens"),
        F.length("text").cast("long").alias("n_chars_text"),
        F.ceil(F.length("text") / 4.0).alias("approx_bpe_tokens"),
        F.size(F.filter(terms, lambda t: F.length(t) > 4)).cast("long").alias(
            "n_long_tokens"
        ),
        F.size(
            F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).cast("long").alias("n_regex_tokens"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ' '),
                           t -> CAST(ascii(substring(t, 1, 1)) * 131
                                     + length(t) AS BIGINT))),
                   (h, c) -> (h * 131 + c) % 1000000007) AS fingerprint
        FROM documents WHERE text IS NOT NULL
    """,
    tags=("text",),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the term sequence
    (mod 1e9+7, base 131) — a content fingerprint that distinguishes
    permuted documents, unlike set-based digests. Exact integer math →
    engine-identical."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    fp = (
        "aggregate(transform(split(text, ' '), "
        "            t -> cast(ascii(substring(t, 1, 1)) * 131 + length(t) as bigint)), "
        "          0L, (h, c) -> (h * 131 + c) % 1000000007)"
    )
    return d.select("doc_id", F.expr(fp).alias("fingerprint"))


@query(
    "q_text_editdist_join",
    oracle="""
        WITH names AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM names a JOIN names b
          ON a.p_name < b.p_name
         AND abs(length(a.p_name) - length(b.p_name)) <= 3
        WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    tags=("text", "fuzzy", "join"),
)
def q_text_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-matching join: distinct part-name pairs within
    Levenshtein distance 3 — the entity-resolution primitive (catalog /
    name reconciliation) done as a blocked self-join.

    Scale shape: the join runs over the DISTINCT name domain (a partial-
    agged shuffle collapses the fact table first — names repeat heavily),
    with a LENGTH-BAND blocking predicate (|len(a)−len(b)| ≤ k is a
    necessary condition for distance ≤ k) pruning pairs before the O(n·m)
    distance evaluation; at larger domains the block key becomes a join
    key (length bucket or first-character) instead of a residual. Both
    engines implement the same textbook DP, so the distances are exact
    integers.
    """
    names = load(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(b, (F.col("name_a") < F.col("name_b"))
               & (F.abs(F.length("name_a") - F.length("name_b")) <= 3))
        .withColumn("dist",
                    F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("dist") <= 3)
    )


# Shared unigram-LM CTE (corpus term frequencies + per-doc term stream)
# and the per-doc surprisal SELECT — reused by q_text_ccnet_buckets's
# oracle so the split is built on the SAME hash-verified score.
_DUCK_UNIGRAM_CTE = """
        WITH tf AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY term
        ),
        tot AS (SELECT SUM(n) AS t FROM tf),
        d AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)"""

#: ``scored``: one surprisal row per TOKEN INSTANCE (one per unnested
#: token of d — NOT per distinct term; _DUCK_BPT_SELECT's COUNT(*)
#: counts tokens). A top-level CTE so composers (q_text_ccnet_buckets)
#: can nest _DUCK_BPT_SELECT inside their own CTE while ``scored``
#: stays in the outer WITH chain. (r9 review: the old comment named a
#: nonexistent ``per`` CTE at the wrong granularity.)
_DUCK_PER_CTE = """
        , scored AS (
            SELECT d.doc_id, d.term,
                   -log2(CAST(tf.n AS DOUBLE) / tot.t) AS val
            FROM d JOIN tf USING (term) CROSS JOIN tot)"""

_DUCK_BPT_SELECT = """
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                         array_agg(val ORDER BY term)), (x, y) -> x + y)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS bits_per_token
        FROM scored GROUP BY doc_id
    """


@query(
    "q_text_unigram_logprob",
    oracle=_DUCK_UNIGRAM_CTE + _DUCK_PER_CTE + _DUCK_BPT_SELECT,
    tags=("text", "quality", "lm"),
)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal per document: mean −log₂ p(term)
    under the corpus's own term distribution — the statistical
    quality/outlier score (high bits-per-token = vocabulary unlike the
    corpus; the cheap stand-in for LM-perplexity filtering, and the
    same join shape a real n-gram LM scorer uses).

    DETERMINISM: p = term-count/total is an exact-BIGINT ratio; each
    log₂ is one libm call on identical doubles. The per-doc sum runs as
    an ORDERED fold over the token-level scores in term order on BOTH
    engines (Spark aggregate over a sorted struct array ≡ DuckDB
    list_reduce over array_agg(… ORDER BY term) — the chi2-drift
    technique; within-term ties carry identical values so the order
    inside a term cannot change the sum; r8 review: a plain F.sum of
    doubles merges in partition-dependent order, a latent
    rounding-boundary flake), then one division by the exact token
    count and 6dp rounding.

    Scale shape: the term-frequency table is a partial-agged aggregate
    (vocabulary-sized — bounded by the language, not the corpus) and
    BROADCASTS into the per-doc explode, so the corpus side never
    shuffles before its per-doc aggregate; the global total rides along
    as a one-row broadcast.
    """
    d = load(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = terms.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    tot = tf.agg(F.sum("n").alias("t"))
    scored = (
        terms.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "term",
                (-F.log2(F.col("n").cast("double") / F.col("t")))
                .alias("val"))
    )
    # term-sorted fold over the TOKEN stream: equal terms carry equal
    # vals, so the within-term order ties cannot change the sum, and
    # the single per-doc groupBy keeps the old one-exchange plan shape
    fold = F.aggregate(
        F.sort_array(F.collect_list(F.struct("term", "val"))),
        F.lit(0.0),
        lambda acc, x: acc + x["val"])
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"),
             F.round(fold / F.count(F.lit(1)).cast("double"), 6)
             .alias("bits_per_token"))
    )


@query(
    "q_text_tfidf",
    oracle="""
        WITH tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
            GROUP BY doc_id, term
        ),
        df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
               FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                       AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf, CAST(rn AS INT) AS rnk
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY doc_id
                  ORDER BY tfidf DESC, tf DESC, df, term) AS rn
              FROM scored)
        WHERE rn <= 3
    """,
    tags=("text", "tfidf", "ranking"),
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyterm extraction: each document's top-3 terms by
    tf·ln(N/df) — the classic distinctive-term statistic behind search
    ranking, topic labeling, and near-dup feature weighting.

    DETERMINISM (r6 hardening): tf/df/N are exact integers; the score is
    two IEEE ops (ln of an exact ratio, one multiply), but libm ln is
    not guaranteed correctly rounded across engines — so ranking uses
    the 6dp-QUANTIZED score (the emitted value) with exact-integer
    (tf DESC, df ASC, term) tie-breaks inside each quantum. A 1-ulp ln
    disagreement can now only matter when a score sits exactly on a
    0.5e-6 rounding boundary (vs. previously any float-adjacent pair of
    scores), and the rank is always consistent with the emitted value.

    Scale shape: the document-frequency table is vocabulary-sized and
    BROADCASTS into the per-doc term counts (corpus side shuffles once,
    for its own (doc, term) aggregate); N rides along as a one-row
    broadcast; the top-3 cut is a per-doc rank on the same partitioning.
    """
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")), 6))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tf").desc(), F.col("df"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )


@query(
    "q_text_source_overlap",
    oracle="""
        WITH v AS (
            SELECT DISTINCT source, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                  FROM v GROUP BY source)
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared,
               round(CAST(COUNT(*) AS DOUBLE)
                     / (MIN(sa.n) + MIN(sb.n) - COUNT(*)), 6) AS jaccard
        FROM v a
        JOIN v b ON a.term = b.term AND a.source < b.source
        JOIN sizes sa ON sa.source = a.source
        JOIN sizes sb ON sb.source = b.source
        GROUP BY a.source, b.source
    """,
    tags=("text", "similarity", "corpus"),
)
def q_text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level vocabulary-overlap matrix: Jaccard similarity of the
    distinct-term sets of every source pair — the corpus-composition
    diagnostic (which crawls duplicate each other's domains?) computed
    with the SAME co-occurrence-join algebra as document-level
    q_dedup_ngram_jaccard, lifted one level up.

    DETERMINISM: |A∩B| via the term-grouped join and |A∪B| = |A|+|B|−|A∩B|
    are exact integers; one division, 6dp.

    Scale shape: the distinct (source, term) projection collapses the
    corpus to ≤ |sources|×|vocab| rows BEFORE the pair join; the join
    keys on term (vocabulary-sized groups), and output is the
    |sources|²/2 matrix. The fact table never self-joins.
    """
    d = load(spark, sf_dir, "documents")
    v = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    sizes = v.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = v.select(F.col("source").alias("source_a"), "term")
    b = v.select(F.col("source").alias("source_b"), "term")
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    inter = (
        a.join(b, ["term"])
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "n_shared",
            F.round(F.col("n_shared").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("n_shared")), 6)
            .alias("jaccard"),
        )
    )
