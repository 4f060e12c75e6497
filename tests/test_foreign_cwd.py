"""Driver-environment regression: worker-side callables must not
require this package on the executors' import path.

The external driver imports ``__spark_entry__`` with ITS OWN cwd and
PYTHONPATH.  Functions shipped to Python workers (plain/pandas UDFs,
mapInPandas/applyInPandas bodies) are normally cloudpickled BY
REFERENCE — the worker then re-imports their defining module, which
only works when the driver happens to run from the repo root.  The
operator modules therefore register themselves pickle-by-value; this
test runs every worker-callable query family in a subprocess whose cwd
is a scratch directory (package importable on the DRIVER via
PYTHONPATH, as the real driver does, but invisible to workers via
cwd) and fails if any worker raises ModuleNotFoundError again.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import os, sys, time
os.environ["TZ"] = "UTC"; time.tzset()
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
import __spark_entry__ as e
qs = e.queries()
sf = "/root/testdata/sf0.001"
for name in ["udf_python_scalar", "udf_pandas_scalar", "udaf_pandas_grouped",
             "udtf_apply_in_pandas", "udtf_map_in_pandas",
             "multimodal_binary_features", "multimodal_frame_sample",
             "stream_stateful_running"]:
    n = qs[name](spark, sf).count()
    print(f"{name}:{n}", flush=True)
print("FOREIGN_CWD_OK")
"""


def test_worker_callables_survive_foreign_cwd(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "FOREIGN_CWD_OK" in proc.stdout, (
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-3000:]}"
    )
