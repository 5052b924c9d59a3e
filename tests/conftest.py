from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def pytest_configure(config):
    # SPARK_GRAFT_FULL_TESTS=1 runs the FULL suite (clears the tiered
    # default `-m "not slow"` from pytest.ini) — the builder's round-end
    # check; the plain invocation stays inside the driver's budget.
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") and config.option.markexpr == "not slow":
        config.option.markexpr = ""


@pytest.fixture(scope="session")
def spark():
    from logstream_processing_service_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(
        app_name="logstream-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
