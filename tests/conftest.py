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


@pytest.fixture(scope="session", autouse=True)
def _no_scratch_leak():
    """The suite must leave /tmp net-clean of pts_* scratch dirs.

    scratch.scratch_dir reaps at interpreter exit (atexit), which runs
    AFTER this fixture's teardown — so we assert against the module's
    live registry instead of the filesystem: every pts_* dir that
    appeared during the run must be one scratch.py is tracking for the
    exit purge.  A bare mkdtemp (the historic leak pattern) shows up
    here as an untracked dir and fails the suite.
    """
    import glob
    import tempfile

    from powertrainstreaming_spark import scratch

    tmp = tempfile.gettempdir()
    before = set(glob.glob(os.path.join(tmp, "pts_*")))
    yield
    after = set(glob.glob(os.path.join(tmp, "pts_*")))
    # Ignore dirs stamped with ANOTHER process's pid (a concurrently
    # running probe/sweep staging its own scratch) and the
    # intentionally persistent tier-stage caches.  The stamp pattern is
    # scratch.stamp_match — the same regex scratch_dir writes against,
    # so gate and implementation cannot drift (ADVICE r6).
    own_or_unmarked = {
        p
        for p in after - before
        if not p.startswith(os.path.join(tmp, "pts_tier_stage"))
        and (
            (m := scratch.stamp_match(p)) is None
            or int(m.group(1)) == os.getpid()
        )
    }
    untracked = sorted(own_or_unmarked - scratch.live_dirs())
    assert not untracked, (
        f"{len(untracked)} pts_* scratch dirs were created outside "
        f"scratch.scratch_dir and would leak past process exit: "
        f"{untracked[:5]}"
    )


@pytest.fixture(scope="session")
def sf_small():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_mid():
    return "/root/testdata/sf0.01"
