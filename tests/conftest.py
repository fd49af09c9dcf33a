from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from raven_spark.session import get_spark

    s = get_spark("raven_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
