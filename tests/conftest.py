from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from weatherdatapipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local parallelism: test data is tiny, scheduling overhead dominates
    s = get_spark("tests", cpus=4, extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
