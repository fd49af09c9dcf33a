from __future__ import annotations

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "http_server_bench: loopback HTTP server fetch benchmark "
        "(real sockets; numbers recorded in BASELINE.md)",
    )


@pytest.fixture(scope="session")
def spark():
    from raven_spark.session import get_spark

    s = get_spark("raven_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
