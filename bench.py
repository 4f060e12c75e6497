"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Protocol mirrors BASELINE.md: one shared SparkSession (JVM startup
amortized, excluded from per-query numbers), one warm-up run, one timed
run around collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from powertrainstreaming_spark.plans.registry import all_defs
from powertrainstreaming_spark.session import get_spark

# Headline set: the 8 BASELINE.md shapes, mapped to registry keys.
# Falls back to every registered query if a headline key is missing.
HEADLINE = [
    "agg_groupby_multi",      # q1_pricing_summary
    "join_shuffle_equi",      # q3_top_orders
    "join_multikey_composite",  # q5_region_rev
    "win_row_number_topk",    # window_topk_per_group
    "stream_tumbling_agg",    # events_tumbling
    "stream_session_window",  # events_sessionize
    "sim_knn_bruteforce",     # knn_bruteforce
    "text_tokenize_tf",       # docs_tokens
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark(app_name="pts-bench")
    defs = all_defs()
    names = [n for n in HEADLINE if n in defs] or sorted(defs)

    timings: dict[str, float] = {}
    for name in names:
        fn = defs[name].fn
        fn(spark, sf_dir).collect()  # warm-up (parquet footer cache, codegen)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_query_total_warm_latency",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
