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

from powertrainstreaming_spark.scratch import scratch_dir
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import TABLE_DDL, TABLES, load


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


@query(
    "scan_csv_json",
    oracle="""
    SELECT 'csv' AS fmt, p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    UNION ALL
    SELECT 'json' AS fmt, p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    """,
    tier="P2",
)
def scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV and JSON ingest with explicit schemas, round-tripped: export
    the part table to both formats in a scratch dir, read each back
    with the DECLARED schema (never inferSchema — inference samples the
    data and can drift between runs), verify both against the source.

    Java's shortest-round-trip double formatting makes the
    p_retailprice text round trip exact in both formats.
    """
    out = scratch_dir(prefix="pts_scan_csv_json_")
    part = load(spark, sf_dir, "part")
    cols = ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
    part.select(cols).write.mode("overwrite").option("header", True).csv(f"{out}/csv")
    part.select(cols).write.mode("overwrite").json(f"{out}/json")
    ddl = TABLE_DDL["part"]
    csv_df = spark.read.schema(ddl).option("header", True).csv(f"{out}/csv")
    json_df = spark.read.schema(ddl).json(f"{out}/json")
    return csv_df.select(F.lit("csv").alias("fmt"), *cols).unionAll(
        json_df.select(F.lit("json").alias("fmt"), *cols)
    )


@query(
    "source_kafka_adapter",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tier="P2",
)
def source_kafka_adapter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-source adapter interface (reference's Kafka direct
    stream, SURVEY.md:182): production wires KafkaSourceAdapter, this
    offline check wires FileReplayAdapter through the SAME interface
    and registry, proving downstream plans are adapter-agnostic.
    KafkaSourceAdapter's offline failure mode is covered in
    tests/test_adapters.py."""
    from powertrainstreaming_spark.sources.stream_adapters import get_adapter
    from powertrainstreaming_spark.streaming.harness import run_bounded

    adapter = get_adapter("file", sf_dir=sf_dir)
    s = adapter.stream(spark)
    agg = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return run_bounded(agg, "complete")


@query(
    "scan_orc_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    WHERE s_acctbal > 0
    """,
    tier="P2",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingest with a declared schema: export supplier to ORC, read
    it back, push a filter — the second columnar format next to
    parquet (mixed-format lakes are the norm when upstream teams pick
    their own writers).  Same loader discipline: schema declared,
    never inferred; predicate pushdown works identically (ORC carries
    min/max stripe stats like parquet row groups).
    """
    out = scratch_dir(prefix="pts_scan_orc_")
    supplier = load(spark, sf_dir, "supplier")
    supplier.write.mode("overwrite").orc(out)
    back = spark.read.schema(TABLE_DDL["supplier"]).orc(out)
    return back.filter(F.col("s_acctbal") > 0).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
