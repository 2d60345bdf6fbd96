from __future__ import annotations

import os

import pytest

from dynaledger_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("dynaledger_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # Override to run the same parity suite at another scale factor,
    # e.g. SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 (the driver's gate).
    return os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMALL)
