from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from opentelemetry_collector_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"  # ~6k turns: unit-test scale


@pytest.fixture(scope="session")
def spark():
    s = get_spark("otelcol-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def transcripts(spark, sf_dir):
    from opentelemetry_collector_spark.sources import tables

    return tables.read_transcripts(spark, sf_dir).cache()
