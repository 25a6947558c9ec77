"""Semantic + plan-shape tests for the third-wave pipeline extensions
(operators/pipeline_ext3.py). Oracle parity for all four queries is
covered by test_oracle_parity.py; these pin the invariants the hash
can't express and the plan shapes the scale story depends on."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from zio_kinesis_example_spark.registry import all_specs

from .conftest import SF_SMALL


def _run(spark, name):
    return all_specs()[name].fn(spark, SF_SMALL)


def test_ccnet_buckets_partition_each_language(spark):
    """Every document lands in exactly one bucket, and within each
    language the three buckets differ in size by at most one (NTILE)."""
    rows = _run(spark, "q_text_ccnet_buckets").collect()
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(rows) == n_docs
    per = {}
    for r in rows:
        per.setdefault(r.lang, {}).setdefault(r.bucket, 0)
        per[r.lang][r.bucket] += 1
    for lang, buckets in per.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        sizes = sorted(buckets.values())
        assert sizes[-1] - sizes[0] <= 1, (lang, buckets)
    # head must hold the LOW-surprisal (most fluent) documents
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault((r.lang, r.bucket), []).append(r.bits_per_token)
    for lang in per:
        if {"head", "tail"} <= set(per[lang]):
            assert max(by_bucket[(lang, "head")]) <= min(
                by_bucket[(lang, "tail")])


def test_hardneg_labels_differ_and_rank_contiguous(spark):
    rows = _run(spark, "q_sample_hardneg").collect()
    assert rows
    per_query = {}
    for r in rows:
        assert r.neighbor_label != r.query_label
        per_query.setdefault(r.query_id, []).append(r)
    for q, rs in per_query.items():
        ranks = sorted(x.rnk for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        # cosine non-increasing with rank
        by_rank = sorted(rs, key=lambda x: x.rnk)
        for a, b in zip(by_rank, by_rank[1:]):
            assert a.cosine >= b.cosine


def test_covariance_matches_numpy(spark):
    """The quantized exact covariance must agree with numpy's float
    covariance of the quantized data to ~1e-6 (independent algorithm)."""
    import numpy as np

    rows = _run(spark, "q_embed_covariance").collect()
    emb = (spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
           .select("embedding").toPandas()["embedding"])
    m = np.floor(np.stack(emb.to_numpy()).astype(np.float64) * 1e6)
    n = len(m)
    cov_np = (m.T @ m * n - np.outer(m.sum(0), m.sum(0))) / (n * n) / 1e12
    dim = m.shape[1]
    assert len(rows) == dim * (dim + 1) // 2
    for r in rows[:200]:
        assert abs(r.cov - cov_np[r.di - 1, r.dj - 1]) < 1e-5
        assert r.n == n
    # diagonal is a variance: strictly positive on real data
    assert all(r.cov > 0 for r in rows if r.di == r.dj)


def test_covariance_kernel_output_is_corpus_size_independent(spark):
    """The Arrow kernel emits <= dim^2 rows per batch: the exchange
    after mapInPandas must carry aggregated partials, not vectors."""
    from zio_kinesis_example_spark.operators.pipeline_ext3 import (
        _COV_DIM, _cov_kernel)
    import numpy as np
    import pandas as pd

    batch = pd.DataFrame({
        "v": [np.arange(_COV_DIM, dtype=np.int64) for _ in range(5000)]})
    out = list(_cov_kernel(iter([batch])))
    assert len(out) == 1
    # second moments + first moments + row count, one row set per chunk
    assert len(out[0]) == _COV_DIM * (_COV_DIM + 1) // 2 + _COV_DIM + 1
    df = out[0]
    assert df[(df.di == 0) & (df.dj == 0)].sxy.iloc[0] == 5000
    first = df[(df.dj == 0) & (df.di > 0)]
    assert len(first) == _COV_DIM
    assert first[first.di == 3].sxy.iloc[0] == 2 * 5000  # col idx 2, value 2


def test_silhouette_accounts_every_vector(spark):
    rows = _run(spark, "q_embed_silhouette").collect()
    total = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert sum(r.n_vectors for r in rows) == total
    for r in rows:
        assert 0 <= r.n_negative <= r.n_vectors
        # margins live in [-2e6, 2e6] scaled (cosines in [-1, 1])
        assert -2_000_000 <= r.min_margin_scaled <= 2_000_000
        if r.n_negative == 0:
            assert r.min_margin_scaled >= 0


def test_hardneg_broadcasts_queries_and_uses_window_topk(spark):
    df = _run(spark, "q_sample_hardneg")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_time_to_convert_orderings(spark):
    rows = {r.step_pair: r for r in _run(spark, "q_events_time_to_convert")
            .collect()}
    assert set(rows) <= {"view->click", "click->purchase", "view->purchase"}
    for r in rows.values():
        assert 0 < r.min_us <= r.p50_us <= r.p90_us <= r.max_us
        assert r.min_us <= r.avg_us <= r.max_us
    if {"view->click", "view->purchase"} <= set(rows):
        # purchase funnel users are a subset of click funnel users
        assert (rows["view->purchase"].n_users
                <= rows["view->click"].n_users)


def test_canonical_accounts_every_document_and_picks_longest(spark):
    canon = _run(spark, "q_dedup_canonical").collect()
    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "n_chars").collect())
    assert sum(r.n_members for r in canon) == len(docs)
    labels = {r.doc_id: r.cluster_id
              for r in _run(spark, "q_dedup_clusters").collect()}
    chars = {d.doc_id: d.n_chars for d in docs}
    for r in canon:
        members = [d for d, c in labels.items() if c == r.cluster_id]
        best = max(members, key=lambda d: (chars[d], -d))
        assert r.rep_doc_id == best
        assert r.rep_n_chars == chars[best]
        assert r.n_dropped == len(members) - 1
