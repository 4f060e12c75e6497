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

Round 11 adds the CHUNKED-VERIFY scale path (the round-10 verdict's
task #6): the 1000× one-shot run dies in a shuffle-spill MERGE — the
merge needs the spill files plus the merged copy simultaneously, so
the ~43 GB steady-state verify shuffle still overruns the 79 GB
scratch quota in its transient.  Because every shuffled byte
downstream of the candidate stream is candidate-pair-proportional,
verifying the stream in K sequential pmod-hash chunks caps the
transient at ~1/K of the one-shot run; the chunk union is the whole
output by construction (a pmod partition of candidates partitions the
emitted pairs), and the within-group 1.0-pairs are computed once
outside the loop.  Two more invocations:

    python scripts/probe_minhash_verify.py --chunked-equiv    # 10x: union == one-shot, bit-equal
    python scripts/probe_minhash_verify.py --chunked-1000 [K] # the 1000x tier, df-monitored

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

    if "--chunked-equiv" in sys.argv:
        _chunked_equiv()
        return
    if "--chunked-1000" in sys.argv:
        i = sys.argv.index("--chunked-1000")
        k = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8
        _chunked_1000(k)
        return

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


def _run_chunked(spark, sf_dir: str, k: int) -> tuple[int, list[int]]:
    """Materialize the candidate stream once (parquet, partitioned by
    pmod chunk so each pass is partition-pruned), then verify chunk by
    chunk, forcing shuffle-file GC between chunks so a completed
    chunk's scratch is reclaimed before the next begins.  Returns
    (total_rows, per_chunk_rows).  A deployment would point each
    chunk's write at its real sink; counting stands in for the sink
    here without changing any shuffle."""
    import gc

    from pyspark.sql import functions as F

    from powertrainstreaming_spark.operators.dedup import (
        _minhash_rep_candidates,
        _verify_cross,
        _within_pairs,
    )

    cand_dir = os.path.join(
        tempfile.gettempdir(), f"pts_minhash_cands_{os.getpid()}"
    )
    cands, grp = _minhash_rep_candidates(spark, sf_dir)
    (
        cands.withColumn(
            "chunk", F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(k))
        )
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(cand_dir)
    )
    stored = spark.read.parquet(cand_dir)
    n_cands = stored.count()
    print(f"candidates materialized: {n_cands} rows, K={k}", flush=True)
    per_chunk: list[int] = []
    total = _within_pairs(grp).count()
    for c in range(k):
        t0 = time.perf_counter()
        chunk = stored.filter(F.col("chunk") == c).select("doc_a", "doc_b")
        rows = _verify_cross(chunk, grp).count()
        per_chunk.append(rows)
        total += rows
        # Drop the chunk's plan references and ask the ContextCleaner
        # to reclaim its shuffle files before the next chunk starts —
        # this is what keeps the peak at ~1/K.
        del chunk
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        print(
            f"  chunk {c}: {rows} pairs in "
            f"{time.perf_counter() - t0:.1f} s",
            flush=True,
        )
    shutil.rmtree(cand_dir, ignore_errors=True)
    return total, per_chunk


def _chunked_equiv() -> None:
    """10× correctness gate for the chunked path: the K-chunk union
    (plus within-pairs) must equal the registered one-shot plan's
    output EXACTLY — both directions of exceptAll empty on the full
    (doc_a, doc_b, jaccard) rows."""
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.session import get_spark

    _stage_into(_STAGE10, 10)
    spark = get_spark(app_name="pts-minhash-chunk-equiv")
    spark.conf.set("spark.sql.shuffle.partitions", "64")

    from pyspark.sql import functions as F

    from powertrainstreaming_spark.operators.dedup import (
        _minhash_rep_candidates,
        _verify_cross,
        _within_pairs,
    )

    k = 4
    cands, grp = _minhash_rep_candidates(spark, _STAGE10)
    cands = cands.localCheckpoint()
    parts = [
        _verify_cross(
            cands.filter(
                F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(k)) == c
            ),
            grp,
        )
        for c in range(k)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionAll(p)
    union = union.unionAll(_within_pairs(grp)).localCheckpoint()
    one_shot = all_defs()["dedup_near_minhash"].fn(
        spark, _STAGE10
    ).localCheckpoint()
    a, b = union.exceptAll(one_shot).count(), one_shot.exceptAll(union).count()
    n_u, n_o = union.count(), one_shot.count()
    assert a == 0 and b == 0 and n_u == n_o, (a, b, n_u, n_o)
    print(
        f"chunked-equiv 10x: OK — {n_u} rows, K={k}, "
        f"exceptAll both directions 0",
        flush=True,
    )


def _chunked_1000(k: int) -> None:
    """The 1000× tier under the chunked verify, df-monitored — the
    top-rung receipt the one-shot plan cannot book on this host."""
    from scale_probe import _STAGE1000, stage_10x

    from powertrainstreaming_spark.session import get_spark

    _stage_into(_STAGE10, 10)
    if not os.path.isdir(_STAGE1000):
        tmp = stage_10x(copies=1000, tables=["documents"])
        os.rename(tmp, _STAGE1000)
    spark = get_spark(app_name="pts-minhash-chunked-1000x")
    spark.conf.set("spark.sql.shuffle.partitions", "640")
    # Warm codegen on the 10x tier (plan-keyed, same as main_1000x).
    from powertrainstreaming_spark.plans.registry import all_defs

    all_defs()["dedup_near_minhash"].fn(spark, _STAGE10).count()

    mon = DfMonitor(tempfile.gettempdir())
    mon.start()
    t0 = time.perf_counter()
    total, per_chunk = _run_chunked(spark, _STAGE1000, k)
    wall = time.perf_counter() - t0
    peak = mon.stop()
    print(
        f"| dedup_near_minhash 1000x chunked K={k} | {wall:.1f} s | "
        f"{total} rows | peak scratch delta {peak / 1e9:.1f} GB | "
        f"chunks {per_chunk} |",
        flush=True,
    )


if __name__ == "__main__":
    main()
