"""Semantic tests for the fourth-wave diagnostics
(operators/pipeline_ext4.py); oracle parity is covered by
test_oracle_parity.py."""

from __future__ import annotations

from zio_kinesis_example_spark.registry import all_specs

from .conftest import SF_SMALL


def _run(spark, name):
    return all_specs()[name].fn(spark, SF_SMALL)


def test_autocorr_bounded_and_lag0_normalized(spark):
    rows = _run(spark, "q_ts_autocorr").collect()
    assert rows
    for r in rows:
        for lg in (1, 2, 24):
            v = getattr(r, f"r{lg}")
            assert -1.000001 <= v <= 1.000001, (r.event_type, lg, v)


def test_power_users_deciles_partition_and_order(spark):
    rows = sorted(_run(spark, "q_events_power_users").collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    n_users = spark.read.parquet(f"{SF_SMALL}/events.parquet") \
        .select("user_id").distinct().count()
    total = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    assert sum(r.n_users for r in rows) == n_users
    assert sum(r.n_events for r in rows) == total
    # deciles ranked by activity: event counts non-increasing
    for a, b in zip(rows, rows[1:]):
        assert a.n_events >= b.n_events
    # ppm shares sum to <= 1e6 (integer truncation), close below it
    s = sum(r.share_ppm for r in rows)
    assert 1_000_000 - 10 <= s <= 1_000_000


def test_dedup_rate_by_source_consistent_with_canonical(spark):
    rows = _run(spark, "q_curate_dedup_rate_by_source").collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs
    total_dropped = sum(r.n_dropped for r in rows)
    # total dropped across sources == sum of (cluster size - 1)
    canon = _run(spark, "q_dedup_canonical").collect()
    assert total_dropped == sum(r.n_dropped for r in canon)
    for r in rows:
        assert 0 <= r.n_dropped <= r.n_docs
        assert r.drop_ppm == r.n_dropped * 1_000_000 // r.n_docs
