from __future__ import annotations

import os

import pytest

from network_ids_using_pyspark_spark.session import get_spark

SF_DIR = os.environ.get("NIDS_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nids-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
