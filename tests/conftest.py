"""Shared fixtures: one session-scoped SparkSession (local mode), testdata
locations, DuckDB oracle connection."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from zio_kinesis_example_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="zke-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_factory_local():
    dirs = []

    def mk(prefix: str = "zke") -> str:
        d = tempfile.mkdtemp(prefix=prefix)
        dirs.append(d)
        return d

    yield mk
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
