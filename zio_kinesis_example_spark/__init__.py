"""PySpark-native analytics engine with the capabilities of
``googley42/zio-kinesis-example`` (reference, read-only at /root/reference),
re-expressed Spark-first, plus the LLM-data-pipeline operator surface
(dedup, similarity search, multimodal columns, text analysis) mandated by
the project north star (SURVEY.md §2.2).

Layout
------
- :mod:`.session`   — SparkSession factory tuned for local[N] testing while
  keeping scale-out defaults (AQE, skew join handling).
- :mod:`.catalog`   — typed loaders for the testdata parquet tables.
- :mod:`.registry`  — central query registry; every operator registers a
  Spark callable and (where expressible) a DuckDB oracle SQL string.
- :mod:`.operators` — the batch operator inventory (SURVEY.md §2.2).
- :mod:`.streaming` — Structured Streaming mirror of the reference's
  sharded-consume / checkpoint semantics (SURVEY.md §2.1 ops 1-15).
"""

from .registry import QUERIES, ORACLES, all_specs  # noqa: F401

__version__ = "0.1.0"
