"""Cell-boundary miss-rate receipt for dedup_embedding_cluster
(round-10 verdict gap #2 / round-11 task #5).

SemDeDup never compares vectors across k-means cells BY DESIGN, so a
≥ τ pair straddling a cell boundary is never examined and its
later-keyed member may survive where a global one-shot rule would
drop it.  The paper accepts this; this probe MEASURES it on the
fixtures so the acceptance is a number, not a shrug:

  - pair_miss_rate: of all exhaustive ≥ τ pairs over the collapsed
    reps, the fraction whose members sit in different cells (the
    pairs the op structurally cannot see).
  - survivor_miss_rate: of the op's survivors, the fraction that have
    an earlier-keyed ≥ τ witness in ANOTHER cell — i.e. vectors a
    global-witness one-shot rule would additionally drop.  This is
    the user-visible miss: extra near-dups left in the corpus.

Exhaustive ground truth is numpy all-pairs over the collected reps —
O(n²·d) on the driver, fine at fixture scale (2 000 × 64), NOT a
pattern for production (that's what dedup_embedding_cosine's blocked
form is for).  Key order matches the op exactly: (c_sim, vec_id)
ascending, c_sim rounded like sim_round.

    python scripts/probe_sem_missrate.py   # appends to docs/SCALE.md
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ["TZ"] = "UTC"
time.tzset()
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def measure(spark, sf_dir: str, op=None) -> dict:
    from pyspark.sql import functions as F

    import powertrainstreaming_spark.operators.similarity as sim
    from powertrainstreaming_spark.functions.exprs import dot_f, sim_round
    from powertrainstreaming_spark.operators.dedup import (
        _EMB_TAU,
        _sem_reps,
        dedup_embedding_cluster,
    )
    from powertrainstreaming_spark.sources.loaders import load

    survivors = {
        r.vec_id
        for r in (op or dedup_embedding_cluster)(spark, sf_dir)
        .select("vec_id")
        .collect()
    }
    reps = _sem_reps(load(spark, sf_dir, "embeddings"))
    cents = sim._train_centroids(spark, reps, k=sim._adaptive_k(reps.count()))
    cents_df = spark.createDataFrame(cents, "cent_id int, c_emb array<double>")
    rows = (
        sim._assign_cells(reps, cents_df, cent_list=cents)
        .join(F.broadcast(cents_df), F.col("cell") == F.col("cent_id"))
        .select(
            "vec_id",
            "cell",
            "embedding",
            sim_round(dot_f("embedding", "c_emb")).alias("c_sim"),
        )
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    cell = np.array([r.cell for r in rows])
    emb = np.array([r.embedding for r in rows], dtype=np.float64)
    key = np.lexsort((ids, np.array([r.c_sim for r in rows])))
    rank = np.empty(len(key), dtype=np.int64)
    rank[key] = np.arange(len(key))

    sims = np.round(emb @ emb.T, 6)
    iu = np.triu_indices(len(ids), k=1)
    tau_pairs = sims[iu] >= _EMB_TAU
    same_cell = cell[iu[0]] == cell[iu[1]]
    n_pairs = int(tau_pairs.sum())
    n_cross = int((tau_pairs & ~same_cell).sum())

    # survivors with an earlier-keyed >= tau witness in ANOTHER cell
    surv_mask = np.isin(ids, list(survivors))
    earlier = rank[:, None] < rank[None, :]  # earlier[a, b]: a keyed before b
    witnessed = (sims >= _EMB_TAU) & earlier & (cell[:, None] != cell[None, :])
    missed = surv_mask & witnessed.any(axis=0)
    return {
        "n_reps": len(ids),
        "k": sim._adaptive_k(len(ids)),
        "tau_pairs": n_pairs,
        "cross_cell_tau_pairs": n_cross,
        "pair_miss_rate": n_cross / max(n_pairs, 1),
        "survivors": len(survivors),
        "cross_cell_missed_survivors": int(missed.sum()),
        "survivor_miss_rate": int(missed.sum()) / max(len(survivors), 1),
    }


def main() -> None:
    from powertrainstreaming_spark.session import get_spark

    spark = get_spark(app_name="pts-sem-missrate")
    lines = [
        "",
        "## Semantic-dedup cell-boundary miss rate (round 11)",
        "",
        "Exhaustive ≥ τ ground truth (numpy all-pairs over the collapsed",
        "reps) vs the op's cell-confined view.  pair_miss = ≥ τ pairs",
        "straddling cells (structurally invisible to SemDeDup);",
        "survivor_miss = survivors a GLOBAL one-shot rule would also drop",
        "(the user-visible residue).",
        "",
        "| fixture/op | reps | k | ≥τ pairs | cross-cell | pair miss | survivors | missed | survivor miss |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    from powertrainstreaming_spark.operators.dedup import (
        dedup_embedding_cluster,
        dedup_embedding_cluster_mp,
    )

    ops = {
        "base": dedup_embedding_cluster,
        "mp": dedup_embedding_cluster_mp,
    }
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        for arm, op in ops.items():
            m = measure(spark, sf, op=op)
            line = (
                f"| {os.path.basename(sf)} {arm} | {m['n_reps']} | {m['k']} | "
                f"{m['tau_pairs']} | {m['cross_cell_tau_pairs']} | "
                f"{m['pair_miss_rate']:.3f} | {m['survivors']} | "
                f"{m['cross_cell_missed_survivors']} | "
                f"{m['survivor_miss_rate']:.3f} |"
            )
            lines.append(line)
            print(line, flush=True)
    with open("docs/SCALE.md", "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
