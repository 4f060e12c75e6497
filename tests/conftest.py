from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import pytest

# Pin the process timezone BEFORE the JVM starts: PySpark's non-Arrow
# collect() renders TimestampType via the driver OS timezone, so hash
# equality with DuckDB's naive timestamps requires TZ=UTC regardless of
# the host default.
os.environ["TZ"] = "UTC"
time.tzset()

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from powertrainstreaming_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # One shared session — JVM startup is 20-30s (SURVEY.md §7.5 #5).
    spark = get_spark(shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_small():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_mid():
    return "/root/testdata/sf0.01"
