"""Tests for tools/content_stress.py (the r12 fifth adversarial axis:
degenerate text + degenerate embeddings) and for the malformed-vector
contract it forced into the embedding family.

What pytest locks:
- the BUILDER's contract (null_stress's rule): deterministic classes,
  the n_chars consistency invariant, untouched tables byte-identical,
  manifest reuse guard;
- the Spark/DuckDB validity filters (``emb_table`` /
  ``catalog.EMB_VALID_SQL``) agree row-for-row on a corpus containing
  every malformed-vector class — the contract whose absence made one
  poison row detonate whole kernels (np.stack on a ragged batch,
  ANSI long overflow on floor(inf*1e6)^2);
- poison rows cost their OWN row only: valid-row results are identical
  with and without poison present (the reference's decode-failure
  contract, TestMsgJsonSerde.scala:17-22, in batch form).

The full-registry sweep over the proxy is a round-level harness run
(BASELINE.md r12), not a pytest.
"""

from __future__ import annotations

import json
import os

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

import zio_kinesis_example_spark.tools.content_stress as CS

SRC001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def proxy_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("contentstress"))
    CS.build_content_proxy(d, src=SRC001, rate_scale=4)
    return d


def test_bucket_deterministic():
    b1 = CS._bucket(50_000, "documents")
    b2 = CS._bucket(50_000, "documents")
    assert (b1 == b2).all()
    assert (CS._bucket(50_000, "embeddings") != b1).any()
    # uniform over [0, 1000)
    assert 0 <= b1.min() and b1.max() < 1000


def test_documents_nchars_invariant_and_classes(proxy_dir):
    t = pq.read_table(os.path.join(proxy_dir, "documents.parquet"))
    text = t.column("text").to_pylist()
    nchars = t.column("n_chars").to_pylist()
    # the lake invariant holds for EVERY row, stressed or not
    # (NULL text → NULL n_chars: unknown content has unknown size)
    assert all((n is None) if s is None else (len(s) == n)
               for s, n in zip(text, nchars))
    assert any(s is None for s in text)                 # NULL-text class
    # stressed rows carry EXACTLY the class the deterministic bucket
    # assigns them (replicated here); unstressed rows are untouched
    src_text = pq.read_table(
        os.path.join(SRC001, "documents.parquet")).column("text").to_pylist()
    pm = min(CS.TEXT_PERMILLE * 4, 500 // CS.TEXT_CLASSES)
    b = CS._bucket(len(text), "documents")
    n_stressed = 0
    for i, (s, orig) in enumerate(zip(text, src_text)):
        if b[i] < pm * CS.TEXT_CLASSES:
            assert s == CS._stress_text(i, int(b[i] // pm))
            n_stressed += 1
        else:
            assert s == orig
    assert n_stressed > 0
    # and the class generator itself covers every declared class
    classes = [CS._stress_text(7, c) for c in range(CS.TEXT_CLASSES)]
    assert classes[0] == "" and classes[10] is None
    assert "\U0001F680" in classes[4] and "" in classes[4]
    assert "数据" in classes[3]
    assert len(classes[7]) >= 19000                     # megadoc
    assert classes[6].startswith("spam spam")


def test_embeddings_classes_and_fixed_tables(proxy_dir):
    t = pq.read_table(os.path.join(proxy_dir, "embeddings.parquet"))
    emb = t.column("embedding").to_pylist()
    assert any(v is None for v in t.column("label").to_pylist())  # NULL label
    dims = {len(v) for v in emb if v is not None}
    assert len(dims) == 2               # majority dim + truncated class
    flat = [v for v in emb if v is not None]
    arrs = [np.array(v, dtype=np.float64) for v in flat]
    assert any(v is None for v in emb)                       # NULL vector
    assert any(np.isnan(a).any() for a in arrs)              # NaN element
    assert any(np.isposinf(a).any() for a in arrs)           # +inf
    assert any(np.isneginf(a).any() for a in arrs)           # -inf
    assert any((a == 0).all() for a in arrs)                 # zero vector
    # duplicate class: some vector equals another row's pristine vector
    keys = {}
    dup = False
    for a in arrs:
        k = a.tobytes()
        dup = dup or k in keys
        keys[k] = True
    assert dup
    # untouched tables are byte-identical copies
    for name in ("orders", "lineitem", "events"):
        src = open(os.path.join(SRC001, f"{name}.parquet"), "rb").read()
        out = open(os.path.join(proxy_dir, f"{name}.parquet"), "rb").read()
        assert src == out


def test_manifest_guard(proxy_dir):
    part = os.path.join(proxy_dir, "documents.parquet")
    mtime = os.path.getmtime(part)
    CS.build_content_proxy(proxy_dir, src=SRC001, rate_scale=4)  # reuse
    assert os.path.getmtime(part) == mtime
    manifest = os.path.join(proxy_dir, "_MANIFEST.json")
    m = json.load(open(manifest))
    CS.build_content_proxy(proxy_dir, src=SRC001, rate_scale=1)  # rebuild
    assert json.load(open(manifest)) != m


def test_valid_filters_agree_between_engines(spark, proxy_dir):
    """emb_table (Spark) and EMB_VALID_SQL (DuckDB) keep the SAME rows
    on a corpus containing every malformed class — the two engines'
    validity judgments are one contract, not two."""
    from zio_kinesis_example_spark.catalog import EMB_VALID_SQL
    from zio_kinesis_example_spark.operators.llm_similarity import emb_table

    spark_ids = {
        r.vec_id for r in emb_table(spark, proxy_dir).select("vec_id").collect()
    }
    con = duckdb.connect()
    p = os.path.join(proxy_dir, "embeddings.parquet")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    duck_ids = {
        r[0] for r in con.sql(
            f"WITH {EMB_VALID_SQL} SELECT vec_id FROM emb_valid").fetchall()
    }
    assert spark_ids == duck_ids
    # and the filter actually dropped the poison rows
    n_total = pq.read_table(p).num_rows
    assert len(spark_ids) < n_total


def test_poison_costs_its_own_row_only(spark, proxy_dir):
    """Valid rows' top-k results are IDENTICAL whether the corpus
    carries poison rows or not, for every query/neighbor pair whose
    ids survive in both corpora — poison never shifts a valid row's
    score, it only vanishes (the reference's per-record decode-failure
    contract in batch form)."""
    from zio_kinesis_example_spark.operators.llm_similarity import (
        q_sim_cosine_topk,
    )

    stressed = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in q_sim_cosine_topk(spark, proxy_dir).collect()
    }
    clean = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in q_sim_cosine_topk(spark, SRC001).collect()
    }
    # scores agree exactly on pairs present in both (ranks can shift
    # because dropped poison/duplicate rows change the candidate pool)
    common = set(stressed) & set(clean)
    assert common, "no overlapping pairs — the proxy dropped everything?"
    assert all(stressed[k] == clean[k] for k in common)
