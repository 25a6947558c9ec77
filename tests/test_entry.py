"""Driver-contract sanity: entry() smoke, registry consistency."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent


def test_entry_smoke(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_registry_consistency(spark):
    qs = ent.queries()
    oracles = ent.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # every oracle-less query is an explicitly approximate/engine-hash op
    from zio_kinesis_example_spark.registry import all_specs
    for name, spec in all_specs().items():
        if spec.oracle is None:
            assert "approx" in spec.tags, (
                f"{name} has no oracle but is not tagged approximate")


def test_multimodal_stub_raises():
    from zio_kinesis_example_spark.operators.multimodal import decode_image_real
    import pytest
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_no_complex_types_in_query_outputs(spark):
    """Driver-canonicalizer contract: every registered query emits only
    scalar columns (array/map/struct outputs crash the hash compare —
    the round-2 q_array_funcs/q_map_funcs failure class). Serialize
    complex values via array_join/to_json before emitting."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from zio_kinesis_example_spark.registry import all_specs

    from .conftest import SF_SMALL

    bad = []
    for name, spec in sorted(all_specs().items()):
        df = spec.fn(spark, SF_SMALL)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, bad
