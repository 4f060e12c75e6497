"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``powertrainstreaming_spark.plans.registry`` — every
operator registers its Spark plan and its DuckDB oracle SQL in one
place, so ``queries()`` and ``oracle_sql()`` can never drift.
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Callable

# PySpark's non-Arrow collect() renders TimestampType via the driver OS
# timezone; pin UTC at import so value hashes don't depend on host TZ.
os.environ["TZ"] = "UTC"
time.tzset()

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from powertrainstreaming_spark.plans.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: the end-to-end training-corpus cleaning
    pipeline (quality gate → exact dedup → near-dup drop), the
    engine's distinctive composition — oracle-gated as
    ``pipeline_corpus_clean`` and golden-pinned in tests/golden/."""
    from powertrainstreaming_spark.operators.dedup import pipeline_corpus_clean

    return pipeline_corpus_clean(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each hash-checked query."""
    return all_oracles()
