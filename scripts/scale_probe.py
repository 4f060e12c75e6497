"""10× scale probe — empirical evidence for the linear-scaling claims.

Stages a 10× replica of the sf0.1 fixtures in a scratch dir (ids
offset per copy so keys stay unique; each table becomes a multi-file
parquet directory, which is also more realistic than the single-file
fixtures) and times representative operators at 1× vs 10×.  An
operator whose wall-clock grows ≲ linearly with input is holding its
contract; anything super-linear is a plan bug.

    python scripts/scale_probe.py          # writes docs/SCALE.md table

Correctness at 10× is NOT re-checked here (no oracle at this scale);
this is a performance-shape probe only.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

os.environ["TZ"] = "UTC"
time.tzset()
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# (table, id columns to offset per copy)
OFFSET_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "customer": [],
    "supplier": [],
    "part": [],
    "region": [],
    "nation": [],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def stage_10x() -> str:
    out = tempfile.mkdtemp(prefix="pts_scale10_")
    for table, id_cols in OFFSET_COLS.items():
        src = pq.read_table(f"{SRC}/{table}.parquet")
        tdir = os.path.join(out, f"{table}.parquet")
        os.makedirs(tdir)
        if not id_cols:
            # dims are NOT replicated: dimensions stay fixed while
            # facts grow — the realistic scale-up shape.
            pq.write_table(src, os.path.join(tdir, "part-0.parquet"))
            continue
        span = {c: (src[c].to_pylist() and max(src[c].to_pylist()) + 1) for c in id_cols}
        for i in range(COPIES):
            cols = {}
            for name in src.column_names:
                if name in id_cols:
                    base = src[name].to_pylist()
                    cols[name] = pa.array([v + i * span[name] for v in base])
                else:
                    cols[name] = src[name]
            pq.write_table(
                pa.table(cols, schema=src.schema),
                os.path.join(tdir, f"part-{i}.parquet"),
            )
    return out


def main() -> None:
    from powertrainstreaming_spark.operators.streaming import (
        sessionize_batch,
        tumbling_batch,
    )
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.session import get_spark

    defs = all_defs()
    probes = {
        "q1_pricing_summary": defs["agg_groupby_multi"].fn,
        "q3_top_orders": defs["join_shuffle_equi"].fn,
        "events_tumbling": tumbling_batch,
        "events_sessionize": sessionize_batch,
        "window_topk_per_group": defs["win_row_number_topk"].fn,
        "knn_bruteforce": defs["sim_knn_bruteforce"].fn,
        "docs_tokens": defs["text_tokenize_tf"].fn,
        "dedup_exact": defs["dedup_exact"].fn,
        "fn_json": defs["fn_json"].fn,
        "sim_topk_per_query": defs["sim_topk_per_query"].fn,
        "sim_pair_join_threshold": defs["sim_pair_join_threshold"].fn,
        "sim_lsh_rp_pairs": defs["sim_lsh_rp_pairs"].fn,
        "dedup_embedding_cosine": defs["dedup_embedding_cosine"].fn,
        "dedup_fuzzy_levenshtein": defs["dedup_fuzzy_levenshtein"].fn,
        "dedup_near_minhash": defs["dedup_near_minhash"].fn,
        "dedup_near_exact": defs["dedup_near_exact"].fn,
        "dedup_near_simhash": defs["dedup_near_simhash"].fn,
        "corpus_decontam_ngram": defs["corpus_decontam_ngram"].fn,
        "pipeline_corpus_clean": defs["pipeline_corpus_clean"].fn,
        "text_tfidf": defs["text_tfidf"].fn,
        "agg_bitmap_distinct": defs["agg_bitmap_distinct"].fn,
        "ts_sliding_distinct": defs["ts_sliding_distinct"].fn,
        "layout_zorder_cluster": defs["layout_zorder_cluster"].fn,
        "index_inverted_postings": defs["index_inverted_postings"].fn,
        "text_entropy": defs["text_entropy"].fn,
        "events_markov_transitions": defs["events_markov_transitions"].fn,
    }

    spark = get_spark(app_name="pts-scale-probe")
    print("staging 10x replica...", flush=True)
    big = stage_10x()

    def timed(fn, sf_dir):
        # noop write, not collect()/count(): count() lets Catalyst
        # PRUNE the aggregate expressions (under-measures 2-4x), and
        # collect() adds Py4J driver transfer that dominates for the
        # dedup ops whose 10x output is millions of rows.  The noop
        # sink executes the full plan and discards rows executor-side.
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        rows = fn(spark, sf_dir).count()  # row count, untimed
        return dt, rows

    lines = [
        "# 10× scale probe",
        "",
        f"Facts replicated ×{COPIES} with offset keys (dims fixed); times",
        "are warm wall-clock collect() on local[32].  ratio ≈ 10 ⇒ linear",
        "scaling; well below 10 ⇒ fixed overhead dominates at 1×.",
        "",
        "The cosine family (sim_topk_per_query, sim_pair_join_threshold,",
        "dedup_embedding_cosine) blocks on (label, ADAPTIVE LSH cell):",
        "the cell count doubles as the corpus crosses size thresholds",
        "(16 cells at 2k vectors -> 256 at 20k), so mean bucket size stays",
        "bounded and blocked-pair work grows ~linearly under replication —",
        "round 3 measured 14.1x for label-only blocking; the adaptive cell",
        "is the fix, measured below.  Note replication duplicates each",
        "vector 10x verbatim, so every replica lands in the SAME cell —",
        "the probe is the adversarial case, not the friendly one.",
        "",
        "Output-row columns matter for the dedup family: verbatim",
        "replication grows the TRUE duplicate mass quadratically in the",
        "copy count, so a near-dup op's output (and thus its work) can",
        "legitimately grow ~100x — read the time ratio against the row",
        "ratio, not against 10.",
        "",
        "| operator | 1× (s) | 10× (s) | ratio | rows 1× | rows 10× |",
        "|---|---|---|---|---|---|",
    ]
    for name, fn in probes.items():
        t1, r1 = timed(fn, SRC)
        t10, r10 = timed(fn, big)
        lines.append(
            f"| {name} | {t1:.2f} | {t10:.2f} | {t10 / t1:.1f}× | {r1} | {r10} |"
        )
        print(lines[-1], flush=True)

    Path("docs/SCALE.md").write_text("\n".join(lines) + "\n")
    shutil.rmtree(big, ignore_errors=True)
    print("wrote docs/SCALE.md")


if __name__ == "__main__":
    main()
