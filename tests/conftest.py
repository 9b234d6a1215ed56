from __future__ import annotations

import os

import pytest

from warcsum_spark.fixtures import write_warc_archives
from warcsum_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, shuffle_partitions=8, app_name="warcsum_spark_tests")
    yield s


@pytest.fixture(scope="session")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcs")
    write_warc_archives(str(d), seed=42)
    return str(d)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
