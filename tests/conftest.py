import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scikit_learn_imputer_spark.session import get_spark


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked 'slow' (the heavy property/e2e tier, "
        "skipped by default so the default suite fits CI windows)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy property/e2e tests, skipped by default; run with "
        "--runslow or SPARK_GRAFT_SLOW_TESTS=1 (full CI-style mode)",
    )


def pytest_collection_modifyitems(config, items):
    # Two-tier suite (VERDICT r14 #1): the default run must finish well
    # inside the driver's capture window; the slow tier is never deleted,
    # only skipped, and runs in full with --runslow / SPARK_GRAFT_SLOW_TESTS=1.
    if config.getoption("--runslow") or os.environ.get(
        "SPARK_GRAFT_SLOW_TESTS"
    ) == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: run with --runslow or SPARK_GRAFT_SLOW_TESTS=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sli-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT
