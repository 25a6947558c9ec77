"""Skew-stress axis (r13): builder determinism + Zipf shape + the
salted-join invariance that is the axis's core claim — results must be
key-distribution-INVARIANT, only plans and walls may move."""

from __future__ import annotations

import os

import numpy as np

from zio_kinesis_example_spark.tools import skew_stress as SK

SF_SMALL = "/root/testdata/sf0.001"


def test_zipf_rekey_shape_and_determinism():
    """Zipf(s=2) over K keys gives the top rank ~1/zeta(2)≈61% of the
    mass; the draw is bit-reproducible and stays inside the domain."""
    vals = np.arange(10_000, dtype=np.int64) % 97 + 1000
    domain = np.unique(vals)
    out1 = SK.zipf_rekey(vals, domain, 2.0, "t.c")
    out2 = SK.zipf_rekey(vals, domain, 2.0, "t.c")
    assert np.array_equal(out1, out2)
    assert set(np.unique(out1)) <= set(domain)
    _, cnts = np.unique(out1, return_counts=True)
    top = cnts.max() / len(out1)
    assert 0.55 < top < 0.67, f"hot-key share {top} off the zeta(2) mass"
    # milder skew: s=1.2 over ~100 keys → top share ~18-30%
    out3 = SK.zipf_rekey(vals, domain, 1.2, "t.c")
    top3 = np.unique(out3, return_counts=True)[1].max() / len(out3)
    assert 0.10 < top3 < 0.40
    assert top3 < top


def test_zipf_rekey_partial_keeps_unselected_rows():
    vals = np.arange(5_000, dtype=np.int64)
    domain = np.unique(vals)
    out = SK.zipf_rekey(vals, domain, 2.0, "t.partial", permille=100)
    changed = (out != vals).mean()
    # ~10% selected; of those a few draw their own key by chance
    assert 0.05 < changed < 0.15


def test_flash_crowd_moves_configured_fraction():
    rng = np.arange(100_000, dtype=np.int64)
    ticks = 1_700_000_000_000_000 + rng * 37_000_000     # ~us spacing
    out = SK._flash_crowd_ts(ticks, 3_600_000_000, "t.ts", 50)
    hours, cnts = np.unique(out // 3_600_000_000, return_counts=True)
    hot = cnts.max() / len(out)
    assert 0.04 < hot < 0.08, f"hot-hour share {hot}"
    # sub-hour offsets preserved for moved rows
    assert np.array_equal(out % 3_600_000_000, ticks % 3_600_000_000)


def test_build_skew_proxy_deterministic_and_guarded(tmpdir_factory_local):
    import hashlib
    import json

    d1 = tmpdir_factory_local("skewa")
    d2 = tmpdir_factory_local("skewb")
    SK.build_skew_proxy(d1, src=SF_SMALL, s=2.0, flash_permille=50)
    SK.build_skew_proxy(d2, src=SF_SMALL, s=2.0, flash_permille=50)

    def h(d, name):
        with open(os.path.join(d, f"{name}.parquet"), "rb") as fh:
            return hashlib.sha256(fh.read()).hexdigest()

    for t in ("events", "orders", "lineitem"):
        assert h(d1, t) == h(d2, t), f"{t} not bit-reproducible"

    # manifest guard: changing s forces a rebuild (events bytes move)
    before = h(d1, "events")
    SK.build_skew_proxy(d1, src=SF_SMALL, s=1.2, flash_permille=50)
    assert h(d1, "events") != before
    with open(os.path.join(d1, "_MANIFEST.json")) as fh:
        assert json.load(fh)["s"] == 1.2


def test_rekeyed_columns_stay_in_domain(tmpdir_factory_local):
    """Referential integrity: every rekeyed FK value exists on its dim
    side, so inner joins lose no rows to dangling keys."""
    import pyarrow.parquet as pq

    d = tmpdir_factory_local("skewri")
    SK.build_skew_proxy(d, src=SF_SMALL, s=2.0, flash_permille=50)
    ev_u = pq.read_table(os.path.join(d, "events.parquet"),
                         columns=["user_id"]).column(0).to_numpy()
    cust = pq.read_table(os.path.join(d, "customer.parquet"),
                         columns=["c_custkey"]).column(0).to_numpy()
    li_p = pq.read_table(os.path.join(d, "lineitem.parquet"),
                         columns=["l_partkey"]).column(0).to_numpy()
    part = pq.read_table(os.path.join(d, "part.parquet"),
                         columns=["p_partkey"]).column(0).to_numpy()
    li_o = pq.read_table(os.path.join(d, "lineitem.parquet"),
                         columns=["l_orderkey"]).column(0).to_numpy()
    orders = pq.read_table(os.path.join(d, "orders.parquet"),
                           columns=["o_orderkey"]).column(0).to_numpy()
    assert set(np.unique(ev_u)) <= set(cust)
    assert set(np.unique(li_p)) <= set(part)
    assert set(np.unique(li_o)) <= set(orders)


def test_salted_join_invariant_under_skew(spark, tmpdir_factory_local):
    """THE axis claim, in miniature: on a hot-key proxy the salted join,
    its unsalted twin, and the DuckDB oracle all agree — salting and
    AQE change the PLAN, never the VALUES."""
    from zio_kinesis_example_spark.tools.oracle import (
        canonical_rows, duckdb_connection, _spark_pdf)
    from zio_kinesis_example_spark.registry import all_specs

    d = tmpdir_factory_local("skewsalt")
    SK.build_skew_proxy(d, src=SF_SMALL, s=2.0, flash_permille=50)
    salted, unsalted = SK._salted_twin_plans(spark, d)
    spec = all_specs()["q_join_skew_salted"]
    a = canonical_rows(_spark_pdf(salted(spark, d)))
    b = canonical_rows(_spark_pdf(unsalted(spark, d)))
    con = duckdb_connection(d)
    c = canonical_rows(con.sql(spec.oracle).df())
    assert a == b == c
