from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Deliberately a VANILLA session (not resin_spark.session.get_spark):
    # the correctness driver runs queries() on its own plain SparkSession,
    # so tests must prove the package works without build-time confs.
    # Round 1 failed precisely because tests ran on a tuned session.
    s = (
        SparkSession.builder.appName("resin_spark-tests")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from resin_spark.io import load_tables

    return load_tables(spark, SF_SMALL)


@pytest.fixture(scope="session")
def tables_med(spark):
    from resin_spark.io import load_tables

    return load_tables(spark, SF_MED)
