from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dropbox_duckdb_playground_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
