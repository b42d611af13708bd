from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "sf01: oracle spot-checks at sf0.1 (bench scale, AQE-sensitive)"
    )


@pytest.fixture(scope="session")
def spark():
    from dataengineeringproject_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    yield spark
