from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_bigdata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_addoption(parser):
    # opt-in scale-factor override for the oracle twin: the default sf0.001
    # keeps the full suite fast; `--sf 0.01` replays the differential at the
    # driver's scale (catches round/tie boundaries that only appear with
    # more rows — ROUND_NOTES fact 5), `--sf 0.1` at bench scale.
    parser.addoption(
        "--sf",
        action="store",
        default=None,
        help="testdata scale factor (e.g. 0.01) or a full sf dir path; "
        "overrides SPARK_GRAFT_TEST_SF_DIR",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir(request):
    opt = request.config.getoption("--sf")
    if opt:
        return opt if "/" in opt else f"/root/testdata/sf{opt}"
    return SF_DIR
