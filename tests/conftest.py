"""Shared pytest fixtures: one session-scoped SparkSession (JVM startup is
~20 s; every Spark test shares it, per the reference's offline-gate
discipline — /root/reference/README.md:245-253 keeps the suite runnable
with no cluster)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from open_finance_lakehouse_spark.session import build_session

    s = build_session(app_name="ofl_tests", master="local[8]",
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path):
    d = tmp_path / "warehouse"
    d.mkdir()
    return str(d)
