"""Tests for tools/null_stress.py — the r12 NULL-distribution proxy
builder (the fourth adversarial value-parity axis).

The sweep itself (oracle parity over the proxy) is a round-level
harness run, not a pytest; what pytest locks is the BUILDER's
contract: deterministic masks, declared rates, key columns untouched,
and the manifest reuse guard (the relational_scale lesson)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq

import zio_kinesis_example_spark.tools.null_stress as NS


def test_mask_is_deterministic_and_rate_accurate():
    m1 = NS._mask(100_000, "events", "value", 40)
    m2 = NS._mask(100_000, "events", "value", 40)
    assert (m1 == m2).all()
    # ~4% +- generous tolerance; the hash is uniform
    assert 0.03 < m1.mean() < 0.05
    # different column -> different (decorrelated) mask
    m3 = NS._mask(100_000, "events", "props", 40)
    assert (m1 != m3).any()
    assert abs(float((m1 & m3).mean()) - m1.mean() * m3.mean()) < 0.002


def test_build_injects_declared_rates_and_never_keys(tmpdir_factory_local):
    d = tmpdir_factory_local("nullproxy")
    NS.build_null_proxy(d, src="/root/testdata/sf0.001")
    for name, rates in NS.RATES.items():
        t = pq.read_table(os.path.join(d, f"{name}.parquet"))
        n = t.num_rows
        for field in t.schema:
            nulls = t.column(field.name).null_count
            if field.name in rates:
                frac = nulls / n
                want = rates[field.name] / 1000
                # binomial-aware bound: tiny sf0.001 tables (customer =
                # 150 rows) legitimately wobble several points
                tol = max(0.02, 4 * (want * (1 - want) / n) ** 0.5)
                assert abs(frac - want) < tol, (name, field.name, frac)
            else:
                # key/id columns and everything undeclared stay intact
                assert nulls == 0, (name, field.name)
    # fixed tables copied byte-identical (join dims + kernel contracts)
    for name in NS.FIXED:
        src = open(f"/root/testdata/sf0.001/{name}.parquet", "rb").read()
        dst = open(os.path.join(d, f"{name}.parquet"), "rb").read()
        assert src == dst, name


def test_manifest_guard_rebuilds_on_rate_change(tmpdir_factory_local):
    d = tmpdir_factory_local("nullmanifest")
    NS.build_null_proxy(d, src="/root/testdata/sf0.001")
    manifest = os.path.join(d, "_MANIFEST.json")
    part = os.path.join(d, "events.parquet")
    mtime = os.path.getmtime(part)
    NS.build_null_proxy(d, src="/root/testdata/sf0.001")  # clean reuse
    assert os.path.getmtime(part) == mtime
    m = json.load(open(manifest))
    m["rates"] = dict(m["rates"], events=dict(m["rates"]["events"], ts=999))
    json.dump(m, open(manifest, "w"))
    NS.build_null_proxy(d, src="/root/testdata/sf0.001")  # rate mismatch
    assert os.path.getmtime(part) > mtime
    assert json.load(open(manifest))["rates"]["events"]["ts"] == \
        NS.RATES["events"]["ts"]
