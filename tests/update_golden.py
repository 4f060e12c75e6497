"""Regenerate tests/golden/snapshots.json (SURVEY.md §5.4 layer 2).

Run after an INTENTIONAL result change or fixture regeneration:

    python tests/update_golden.py

Stores, for every registered query at sf0.001: row count, sorted
column names, and the canonical order-insensitive value hash.  The
snapshot pins results against SIMULTANEOUS drift of engine + oracle —
the failure mode the DuckDB gate cannot see.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ["TZ"] = "UTC"
time.tzset()
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN_PATH = Path(__file__).resolve().parent / "golden" / "snapshots.json"
SF = "/root/testdata/sf0.001"


def build_snapshots() -> dict:
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.session import get_spark
    from powertrainstreaming_spark.testing import canonical_hash

    spark = get_spark(shuffle_partitions=8)
    snaps = {}
    for name, qd in all_defs().items():
        df = qd.fn(spark, SF)
        rows = [tuple(r) for r in df.collect()]
        snaps[name] = {
            "rows": len(rows),
            "cols": sorted(df.columns),
            "hash": canonical_hash(rows, list(df.columns)),
        }
    return snaps


if __name__ == "__main__":
    GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
    snaps = build_snapshots()
    GOLDEN_PATH.write_text(json.dumps(snaps, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(snaps)} snapshots to {GOLDEN_PATH}")
