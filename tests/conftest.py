from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from lakehouse_weather_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import os
    import tempfile

    # fresh warehouse per test session: managed-table locations outlive
    # the in-memory catalog, so a reused dir breaks saveAsTable
    os.environ["SPARK_GRAFT_WAREHOUSE"] = tempfile.mkdtemp(prefix="lws_wh_")
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
