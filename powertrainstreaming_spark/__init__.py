"""powertrainstreaming_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of ``retroryan/PowertrainStreaming``
(a Spark Streaming telemetry application; see SURVEY.md §0 — the
reference checkout was empty at survey time, so the capability
envelope is reconstructed in SURVEY.md §2 and that inventory is the
contract this package implements).

Design principles (SURVEY.md §4, §7.3):
- Everything is a DataFrame with an explicit StructType; no RDD API.
- Declarative plans — Catalyst does pushdown/pruning/join selection.
- Determinism contract (SURVEY.md §5.3) centralized in
  ``functions.exprs`` so every query hash-matches the DuckDB oracle.
- Streaming ops run through a bounded-replay harness
  (``streaming.harness``) so they are batch-equivalent and testable.
"""

from powertrainstreaming_spark.plans.registry import (  # noqa: F401
    all_queries,
    all_oracles,
    get_query,
)

__version__ = "0.1.0"
