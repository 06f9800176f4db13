from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bigartm_spark.session import get_spark

    s = get_spark("bigartm_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def docs(spark, sf_dir):
    from bigartm_spark.corpus import docs_from_lineitem

    return docs_from_lineitem(spark, sf_dir).cache()
