"""Full-surface sf0.1 oracle sweep (the README's standing claim).

The driver gate runs at sf0.01; this sweep re-verifies EVERY registered
query against its DuckDB oracle at 10x that scale, where boundary/tie/
duplicate latents live (it caught two in round 2).  Run per round:

    python scripts/sweep_sf01.py

Prints one line per query; exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ["TZ"] = "UTC"
time.tzset()
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honors bench.py's SPARK_GRAFT_SF_DIR knob; SPARK_GRAFT_SWEEP_DIR is a
# sweep-specific override that wins when both are set.  Default: 10x gate.
SF = os.environ.get(
    "SPARK_GRAFT_SWEEP_DIR",
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
)


def main() -> int:
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.session import get_spark
    from powertrainstreaming_spark.testing import compare, oracle_connection

    spark = get_spark(app_name="pts-sweep-sf01")
    con = oracle_connection(SF)
    failures = []
    for name, qd in all_defs().items():
        t0 = time.perf_counter()
        try:
            df = qd.fn(spark, SF)
            if qd.oracle is None:
                n = df.count()
                status = f"rows-only ({n} rows)"
            else:
                res, _, _ = compare(name, df, con, qd.oracle)
                if res.ok:
                    status = "ok"
                else:
                    status = (
                        f"MISMATCH rows {res.rows_spark}/{res.rows_oracle} "
                        f"hash {res.hash_spark[:8]}/{res.hash_oracle[:8]}"
                    )
                    failures.append(name)
        except Exception as exc:  # noqa: BLE001 — report and continue the sweep
            status = f"ERROR {type(exc).__name__}: {exc}"
            failures.append(name)
        print(f"{name:40s} {status:30s} {time.perf_counter() - t0:6.1f}s", flush=True)
    print(f"\n{len(all_defs())} queries, {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
