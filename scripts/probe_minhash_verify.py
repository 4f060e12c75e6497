"""Verify-stage shuffle probe for the reworked dedup_near_minhash.

Round 8 root-caused the op's 1000× failure to the exact-verify
shuffle: ~240 GB of scratch (two ~100-token packed arrays per
CANDIDATE pair) against a 79 GB host quota, with a df-monitor reading
24 GB of peak scratch at 100× (docs/SCALE.md).  Round 9 reworked the
op to the sim_containment_join discipline — exact-dup collapse, band
signatures once per distinct set, an EXACT-INT size-ratio prune inside
the band join, scalar emission from the verify stage.  This probe
turns "materially cut" into numbers at the same 100× tier:

1. CANDIDATE DECOMPOSITION — candidate-pair count with and without the
   size-ratio prune (collapse held constant): candidates are the unit
   the verify shuffle is linear in, so the prune ratio IS the shuffle
   ratio, measured exactly rather than inferred from disk noise.
2. DF MONITOR — peak scratch-filesystem delta sampled at 1 Hz during a
   fresh full run (comparable to round 8's 24 GB reading).

Usage — TWO invocations, not one (probe-hygiene rule):

    python scripts/probe_minhash_verify.py                    # phase 1 only
    python scripts/probe_minhash_verify.py --skip-candidates  # phase 2 only

Phase 1 (candidate decomposition) runs spill-heavy counting joins; a
df-monitored timed run launched in the SAME JVM right after it reads
inflated (the CLAUDE.md fresh-JVM/settled-host trap, measured up to
5.7× high in round 8).  For a RECEIPT-GRADE wall/scratch number, run
phase 2 as a separate `--skip-candidates` invocation in a fresh
process after the host settles; the flagless form is for the
deterministic phase-1 counts only.  One op, one JVM per invocation
(the scale_probe spill-reclaim rule).
"""

from __future__ import annotations

import os
import shutil
import sys
import threading
import time
from pathlib import Path

os.environ["TZ"] = "UTC"
time.tzset()
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import tempfile

from scale_probe import _STAGE10, _STAGE100, _stage_into


class DfMonitor(threading.Thread):
    """Sample used bytes on the scratch filesystem; track the peak
    delta vs the baseline taken at start()."""

    def __init__(self, path: str):
        super().__init__(daemon=True)
        self.path = path
        self.base = shutil.disk_usage(path).used
        self.peak = 0
        # NB: the name must not be _stop — threading.Thread.join()
        # calls self._stop() internally, and shadowing it with an
        # Event raises "'Event' object is not callable" at join time
        # (bit round 9's first probe run AFTER the timed query
        # finished — the wall reading was lost to the crash).
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            used = shutil.disk_usage(self.path).used - self.base
            if used > self.peak:
                self.peak = used
            time.sleep(1.0)

    def stop(self) -> int:
        self._halt.set()
        self.join()
        return self.peak


def main() -> None:
    from pyspark.sql import functions as F

    from powertrainstreaming_spark.operators.dedup import (
        _JAC_TAU_DEN,
        _JAC_TAU_NUM,
        _MINHASH_B,
        _band_sigs_wide_from_h,
        _collapse_sets,
        _doc_tokens,
    )
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.session import get_spark

    _stage_into(_STAGE10, 10)
    _stage_into(_STAGE100, 100)
    spark = get_spark(app_name="pts-minhash-verify-probe")
    spark.conf.set("spark.sql.shuffle.partitions", "640")

    if "--skip-candidates" in sys.argv:
        # Receipt-grade path: the timed df-monitored run alone, in its
        # own JVM, after phase 1 ran (and settled) in a prior process.
        _timed_run(spark)
        return

    # --- 1. candidate decomposition at 100× (collapse held constant) —
    # counts only, cheap relative to the verify itself.
    toks = _doc_tokens(spark, _STAGE100)
    grp = _collapse_sets(toks, "probe")
    rep_h = grp.select(
        F.col("rep").alias("doc_id"), F.explode("codes").alias("c")
    ).select("doc_id", F.expr("c div 2147483648").alias("h"))
    sigs = _band_sigs_wide_from_h(rep_h).localCheckpoint()
    sizes = grp.select(
        F.col("rep").alias("doc_id"), F.size("codes").alias("n")
    )
    sa = sigs.join(sizes, "doc_id").select(
        F.col("doc_id").alias("doc_a"),
        "band",
        "sig",
        F.col("n").alias("na"),
        *[F.col(f"s{j}").alias(f"sa{j}") for j in range(_MINHASH_B - 1)],
    )
    sb = sigs.join(sizes, "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
        F.col("n").alias("nb"),
        *[F.col(f"s{j}").alias(f"sb{j}") for j in range(_MINHASH_B - 1)],
    )
    base_cond = (
        (F.col("band") == F.col("band_b"))
        & (F.col("sig") == F.col("sig_b"))
        & (F.col("doc_a") < F.col("doc_b"))
    )
    prune = (F.col("na") * _JAC_TAU_DEN >= F.col("nb") * _JAC_TAU_NUM) & (
        F.col("nb") * _JAC_TAU_DEN >= F.col("na") * _JAC_TAU_NUM
    )
    n_unpruned = (
        sa.join(sb, base_cond).select("doc_a", "doc_b").distinct().count()
    )
    n_pruned = (
        sa.join(sb, base_cond & prune)
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    # Round-10 decomposition: the duplicate pair STREAM the old
    # .distinct() had to shuffle (a pair re-emitted once per matching
    # band) vs the first-match-band stream (exactly one row per
    # candidate — must equal the distinct count, asserted).
    n_stream = sa.join(sb, base_cond & prune).count()
    first_match = F.lit(True)
    for j in range(_MINHASH_B - 1):
        first_match = first_match & (
            (F.col("band") <= j) | (F.col(f"sa{j}") != F.col(f"sb{j}"))
        )
    n_first = sa.join(sb, base_cond & prune & first_match).count()
    assert n_first == n_pruned, (n_first, n_pruned)
    n_groups = grp.count()
    print(
        f"100x candidates: {n_unpruned} without size prune, "
        f"{n_pruned} with ({100 * (1 - n_pruned / max(n_unpruned, 1)):.1f}% "
        f"cut); duplicate stream {n_stream} rows "
        f"(x{n_stream / max(n_pruned, 1):.2f}) vs first-match {n_first}; "
        f"{n_groups} distinct sets",
        flush=True,
    )

    # Phase 2 (the timed run) is deliberately NOT chained here — run it
    # as a fresh `--skip-candidates` invocation (docstring: the
    # same-JVM chain reads inflated).


def _timed_run(spark) -> None:
    from powertrainstreaming_spark.plans.registry import all_defs

    mon = DfMonitor(tempfile.gettempdir())
    mon.start()
    t0 = time.perf_counter()
    rows = all_defs()["dedup_near_minhash"].fn(spark, _STAGE100).count()
    wall = time.perf_counter() - t0
    peak = mon.stop()
    print(
        f"| dedup_near_minhash 100x | {wall:.1f} s | {rows} rows | "
        f"peak scratch delta {peak / 1e9:.1f} GB |",
        flush=True,
    )


if __name__ == "__main__":
    main()
