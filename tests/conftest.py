import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from nativeextractor_spark.session import get_spark

    spark = get_spark("nativeextractor-tests", shuffle_partitions=4)
    yield spark


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
