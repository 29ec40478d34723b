from __future__ import annotations

import pytest

from searchenginer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_sf0001(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
