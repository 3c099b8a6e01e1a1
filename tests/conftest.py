from __future__ import annotations

import pytest

from resin_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("resin_spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from resin_spark.io import load_tables

    return load_tables(spark, SF_SMALL)
