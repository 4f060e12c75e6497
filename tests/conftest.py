from __future__ import annotations

import sys
from pathlib import Path

import pytest

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
