"""Scan / source operators (SURVEY.md §2.1).

At 100 TB a "scan" is never a full materialization: these queries
reduce to aggregates so the parquet reader's column pruning and
row-group statistics do the heavy lifting — `.explain` shows
ReadSchema limited to referenced columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import TABLES, load


@query(
    "scan_parquet",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber
    FROM lineitem
    """,
    tier="P0",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full lineitem scan reduced to count/min/max — prunes to 2 cols."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.sum("l_linenumber").alias("sum_linenumber"),
    )


_COUNTS_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {t}"
    for t in TABLES
)


@query("scan_schema_assert", oracle=_COUNTS_ORACLE, tier="P0")
def scan_schema_assert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load all 10 tables with their asserted schemas; emit row counts.

    A failed schema assertion surfaces as a read error here, so this
    doubles as the loader regression test.
    """
    counts = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in TABLES
    ]
    return reduce(DataFrame.unionAll, counts)
