import os

import pytest

from gamma_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "gamma_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.legacy.parquet.nanosAsLong": "true"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from gamma_spark.sources.ingest import normalize_event_time

    return normalize_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    )
