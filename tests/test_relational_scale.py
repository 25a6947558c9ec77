"""Guards for the relational scale-proxy harness (r11): the key-shift
invariants the measurement's validity rests on, and the manifest reuse
guard that keeps a stale proxy from being silently served."""

from __future__ import annotations

import json
import os

from zio_kinesis_example_spark.tools import relational_scale as R


def test_offsets_are_not_multiples_of_the_grid_modulus():
    """The r11 self-correction, locked: the grid queries derive
    coordinates as (key % 10000) * c % 10000, so any key offset that is
    a multiple of 10000 makes every copy STACK on the same grid
    positions (the first measurement's round domain sizes did exactly
    that — pair counts read 3x above density^2). Offsets must also
    exceed the 1x key domain so copies stay disjoint islands."""
    maxes = {"orderkey": 149_999, "custkey": 14_999, "partkey": 19_999,
             "suppkey": 999, "eventid": 99_999}
    for name, off in R._DOMAINS.items():
        assert off % 10_000 != 0, f"{name} offset stacks the grid"
        assert off > maxes[name], f"{name} offset overlaps key islands"


def test_shift_map_covers_every_fk_domain():
    """events.user_id must shift with the custkey domain (it joins
    c_custkey in q_join_skew_salted) and both sides of each FK pair
    must share one domain — a drifted shift silently breaks join
    fan-out and every proxy wall measured on it."""
    s = R._SHIFTS
    assert s["events"]["user_id"] == s["customer"]["c_custkey"] == "custkey"
    assert s["orders"]["o_custkey"] == "custkey"
    assert s["lineitem"]["l_orderkey"] == s["orders"]["o_orderkey"]
    assert s["lineitem"]["l_partkey"] == s["part"]["p_partkey"]
    assert s["lineitem"]["l_suppkey"] == s["supplier"]["s_suppkey"]


def test_target_queries_cover_the_declared_surface():
    from zio_kinesis_example_spark.registry import all_specs

    names = R.target_queries(all_specs())
    assert len(names) == 53                 # +1 r12: the capped fuse
    assert sum(n.startswith("q_tpch_") for n in names) == 21  # + q_agg_group
    assert "q_agg_group" in names and "q_join_interval_overlap" in names
    assert "q_join_interval_overlap_capped" in names


def test_manifest_guard_rebuilds_on_offset_change(tmpdir_factory_local):
    """A proxy dir built under DIFFERENT offsets (or copies) must be
    torn down and rebuilt, never silently reused — the r11 lesson: a
    part-file-count-only guard served the stacked-offset proxy."""
    d = tmpdir_factory_local("relmanifest")
    R.build_tpch_proxy(d, 1)
    manifest = os.path.join(d, "_MANIFEST.json")
    part = os.path.join(d, "orders.parquet", "part-00000.parquet")
    mtime = os.path.getmtime(part)
    R.build_tpch_proxy(d, 1)                      # clean reuse: no rewrite
    assert os.path.getmtime(part) == mtime
    m = json.load(open(manifest))
    m["domains"] = dict(m["domains"], orderkey=150_000)
    json.dump(m, open(manifest, "w"))
    R.build_tpch_proxy(d, 1)                      # offset mismatch: rebuild
    assert json.load(open(manifest))["domains"]["orderkey"] == 150_001
    assert os.path.getmtime(part) > mtime
