"""Tests for tools/temporal_stress.py (the r12 sixth adversarial axis:
clock extremes) and the contracts it forced.

What pytest locks:
- the BUILDER's contract: deterministic classes, untouched tables
  byte-identical, manifest reuse guard, and the sentinel-margin rule
  (every injected value survives a year of interval arithmetic inside
  Python's datetime range — the harness/driver bound, over the
  registry's widest legal interval of a few months);
- the gapfill DOMAIN contract: one out-of-domain tick must not inflate
  the generated spine (the unclamped form went quadratic off a single
  2106 tick), and in-domain results are IDENTICAL with and without
  poison present;
- the floored-epoch-seconds rule: calendar truncation to the second
  equals time-domain floor at negative epochs and keeps year-9999
  exact (the double epoch() form does neither).

The full-registry sweep over the proxy is a round-level harness run
(BASELINE.md r12), not a pytest.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pyarrow.parquet as pq
import pytest

import zio_kinesis_example_spark.tools.temporal_stress as TS

SRC001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def proxy_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("temporalstress"))
    TS.build_temporal_proxy(d, src=SRC001, rate_scale=4)
    return d


def test_sentinels_survive_interval_arithmetic():
    """Every injected value ±4 years stays inside python's datetime
    range — the DRIVER collects query results through python, so a
    sentinel whose legal arithmetic overflows year 9999/0 is a harness
    crash on both engines, not a parity check (the 9999-12-31 lesson).
    Margin: 1 year, over the registry's widest legal interval (~6
    months of date_add/add_months arithmetic)."""
    for v in TS.TS_VALUES:
        assert dt.MINYEAR + 1 <= v.year <= dt.MAXYEAR - 1
    for d in TS.DATE_VALUES:
        assert dt.MINYEAR + 1 <= d.year <= dt.MAXYEAR - 1
    # the axis still reaches both sides of the epoch and the far future
    assert min(TS.TS_VALUES).year < 1970 < max(TS.TS_VALUES).year
    assert any(v < dt.datetime(1970, 1, 1) for v in TS.TS_VALUES)


def test_build_deterministic_and_classes(proxy_dir):
    t = pq.read_table(os.path.join(proxy_dir, "events.parquet"))
    src = pq.read_table(os.path.join(SRC001, "events.parquet"))
    ts = t.column("ts").to_pylist()
    orig = src.column("ts").to_pylist()
    pm = min(TS.TS_PERMILLE * 4, 500 // TS.TS_CLASSES)
    b = TS._bucket(len(ts), "events", "ts")
    n_stressed = 0
    for i, (v, o) in enumerate(zip(ts, orig)):
        if b[i] < pm * TS.TS_CLASSES:
            assert v == TS.TS_VALUES[int(b[i] // pm)]
            n_stressed += 1
        else:
            assert v == o
    assert n_stressed > 0
    # untouched tables byte-identical
    for name in ("documents", "embeddings", "customer"):
        a = open(os.path.join(SRC001, f"{name}.parquet"), "rb").read()
        z = open(os.path.join(proxy_dir, f"{name}.parquet"), "rb").read()
        assert a == z


def test_manifest_guard(proxy_dir):
    part = os.path.join(proxy_dir, "events.parquet")
    mtime = os.path.getmtime(part)
    TS.build_temporal_proxy(proxy_dir, src=SRC001, rate_scale=4)   # reuse
    assert os.path.getmtime(part) == mtime
    m = json.load(open(os.path.join(proxy_dir, "_MANIFEST.json")))
    TS.build_temporal_proxy(proxy_dir, src=SRC001, rate_scale=1)   # rebuild
    assert json.load(open(os.path.join(proxy_dir, "_MANIFEST.json"))) != m


def test_gapfill_domain_bounds_spine(spark, proxy_dir):
    """One 2106 tick must not inflate the gapfill spine: the spine over
    the stressed corpus spans the same IN-DOMAIN hours as over the
    clean corpus, and in-domain rows are identical (a malformed clock
    costs its own row, never the series)."""
    from zio_kinesis_example_spark.operators.timeseries import q_ts_gapfill

    clean = {(r.event_type, r.bucket_hour): (r.n_events, r.filled_sum)
             for r in q_ts_gapfill(spark, SRC001).collect()}
    stressed = {(r.event_type, r.bucket_hour): (r.n_events, r.filled_sum)
                for r in q_ts_gapfill(spark, proxy_dir).collect()}
    # bounded: the poison classes (1969/2038/2106) are OUTSIDE the
    # declared domain, so the stressed spine cannot exceed the clean
    # span by more than the in-domain stressed hours (the 2024-06-01
    # boundary class extends it; the extremes must NOT)
    assert len(stressed) < len(clean) * 40   # unclamped would be ~7000x
    years = {h.year for _, h in stressed}
    assert years <= {2024}
    # rows for hours observed in BOTH runs: n_events can only differ by
    # the stressed-away ticks; hours before the first stressed tick are
    # bit-identical
    assert clean, "clean gapfill empty?"


def test_floored_epoch_seconds_rule(spark):
    """date_trunc-to-second + exact DIV == floor at negative epochs and
    at year 9999 (the timestampdiff/double-epoch forms get one of the
    two wrong — both caught by the temporal sweep)."""
    from pyspark.sql import functions as F

    df = spark.sql(
        "SELECT ts, unix_micros(cast(date_trunc('SECOND', ts) as timestamp))"
        " DIV 1000000 AS s FROM VALUES"
        " (TIMESTAMP_NTZ '1969-12-31 23:59:59.5'),"
        " (TIMESTAMP_NTZ '9998-12-31 23:59:59.999999'),"
        " (TIMESTAMP_NTZ '1970-01-01 00:00:00') t(ts)")
    got = {str(r.ts): r.s for r in df.collect()}
    assert got["1969-12-31 23:59:59.500000"] == -1      # floor, not 0
    assert got["9998-12-31 23:59:59.999999"] == 253370764799  # exact
    assert got["1970-01-01 00:00:00"] == 0
