"""Unit tests for the crash-path scratch-dir reaper (scratch.py).

The atexit purge cannot run when a process is SIGKILLed, so
`_reap_dead_owner_dirs` (invoked at package import) must remove any
`pts_*_p<pid>_*` dir whose embedded owner PID no longer exists — and
must NOT touch live-owner dirs, unstamped dirs, or the persistent
tier-stage caches.  Round-6 verdict "What's wrong" #1 / next-round #2.
"""

from __future__ import annotations

import os
import subprocess
import sys

from powertrainstreaming_spark import scratch


def _dead_pid() -> int:
    """A PID guaranteed not to be running: spawn a child, reap it."""
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    return proc.pid


def test_reaper_removes_dead_owner_dir(tmp_path):
    dead = _dead_pid()
    victim = tmp_path / f"pts_fake_p{dead}_abc12345"
    victim.mkdir()
    (victim / "part-0000.parquet").write_bytes(b"x")
    reaped = scratch._reap_dead_owner_dirs(tmp=str(tmp_path))
    assert str(victim) in reaped
    assert not victim.exists()


def test_reaper_keeps_live_owner_dir(tmp_path):
    mine = tmp_path / f"pts_fake_p{os.getpid()}_abc12345"
    mine.mkdir()
    reaped = scratch._reap_dead_owner_dirs(tmp=str(tmp_path))
    assert reaped == []
    assert mine.exists()


def test_reaper_keeps_unstamped_dirs(tmp_path):
    # tier-stage caches and anything without the _p<pid>_<suffix> stamp
    # are intentionally persistent
    for name in ("pts_tier_stage10", "pts_tier_stage100", "pts_misc"):
        (tmp_path / name).mkdir()
    reaped = scratch._reap_dead_owner_dirs(tmp=str(tmp_path))
    assert reaped == []
    assert sorted(p.name for p in tmp_path.iterdir()) == [
        "pts_misc",
        "pts_tier_stage10",
        "pts_tier_stage100",
    ]


def test_reaper_suffix_tolerance(tmp_path):
    # mkdtemp's suffix is 8 chars today; the stamp pattern tolerates a
    # CPython change to anywhere in {6,12} (ADVICE r6) — and rejects
    # lengths outside it.
    dead = _dead_pid()
    six = tmp_path / f"pts_a_p{dead}_abcdef"
    twelve = tmp_path / f"pts_b_p{dead}_abcdefabcdef"
    thirteen = tmp_path / f"pts_c_p{dead}_abcdefabcdefx"
    for d in (six, twelve, thirteen):
        d.mkdir()
    scratch._reap_dead_owner_dirs(tmp=str(tmp_path))
    assert not six.exists()
    assert not twelve.exists()
    assert thirteen.exists()  # not a valid stamp — never reaped


def test_live_dirs_tracks_scratch_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", None)  # re-read TMPDIR
    path = scratch.scratch_dir(prefix="pts_unittest_")
    try:
        assert path in scratch.live_dirs()
        assert scratch.stamp_match(path) is not None
        assert int(scratch.stamp_match(path).group(1)) == os.getpid()
    finally:
        scratch._LIVE.discard(path)
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    monkeypatch.setattr(tempfile, "tempdir", None)
