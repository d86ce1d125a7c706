from __future__ import annotations

import os
import tempfile

import pytest

from mbai_gdb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Static confs (warehouse dir) must be set before the session exists.
    wh = tempfile.mkdtemp(prefix="spark-wh-")
    os.environ["SPARK_GRAFT_WAREHOUSE"] = wh
    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
