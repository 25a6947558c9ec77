"""Batch operator inventory (SURVEY.md §2.2).

Modules register queries into :mod:`..registry` on import:

- :mod:`.relational`     — scans, filters, joins, aggregations, windows,
  sort/top-k, set ops, subqueries.
- :mod:`.timeseries`     — hypertable rollups, gap filling, interval-range
  windows, OHLC resampling over the events table.
- :mod:`.analytics`      — TPC-H-shaped multi-join decision support
  (Q3 shipping priority, Q5 local supplier volume) and integer-exact
  PageRank over the part↔supplier graph.
- :mod:`.events_analytics` — SCD2 interval reconstruction, ordered
  funnel conversion, retention cohorts.
- :mod:`.scalar_funcs`   — string/date/math/array/map/json/case function
  queries.
- :mod:`.llm_dedup`      — exact + near-duplicate detection (hash, n-gram
  Jaccard, MinHash-LSH, SimHash, embedding-cosine).
- :mod:`.llm_similarity` — similarity search over embeddings (brute-force
  top-k baseline + LSH-bucketed scale path).
- :mod:`.llm_text`       — language-ID, quality scoring, token counting,
  fingerprinting, term frequencies.
- :mod:`.multimodal`     — opaque-binary column plumbing with Pandas-UDF
  decode stubs.
- :mod:`.udfs`           — scalar Python/pandas UDF and grouped UDAF
  (applyInPandas) demonstrations.
"""
