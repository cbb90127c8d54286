import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from scala_timeseries_lib_spark.plans.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    yield spark
