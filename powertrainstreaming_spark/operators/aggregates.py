"""Aggregation operators (SURVEY.md §2.4) + the tumbling batch twin.

Grouped aggregations are the reference's core per-key/per-window
computation (SURVEY.md §0 envelope: keyed count/avg/min/max over
telemetry channels).  Spark's HashAggregateExec already does
partial (map-side) + final aggregation, so at 100 TB the shuffle
carries one row per (partition, group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import (
    money_avg,
    money_sum,
    o_money_avg,
    o_money_sum,
)
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

_Q1_CUTOFF = "2001-09-01"


@query(
    "agg_groupby_multi",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_money_sum('l_quantity')} AS sum_qty,
           {o_money_sum('l_extendedprice')} AS sum_base_price,
           {o_money_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {o_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {o_money_avg('l_quantity')} AS avg_qty,
           {o_money_avg('l_extendedprice')} AS avg_price,
           {o_money_avg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
    tier="P0",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q1 shape: multi-aggregate groupBy over lineitem."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit(_Q1_CUTOFF))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum("l_quantity").alias("sum_qty"),
        money_sum("l_extendedprice").alias("sum_base_price"),
        money_sum(disc_price).alias("sum_disc_price"),
        money_sum(charge).alias("sum_charge"),
        money_avg("l_quantity").alias("avg_qty"),
        money_avg("l_extendedprice").alias("avg_price"),
        money_avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_global",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           {o_money_sum('l_extendedprice')} AS sum_price,
           {o_money_avg('l_quantity')} AS avg_qty,
           MIN(l_shipdate) AS min_shipdate,
           MAX(l_shipdate) AS max_shipdate,
           MIN(l_discount) AS min_disc,
           MAX(l_discount) AS max_disc
    FROM lineitem
    """,
    tier="P0",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregation — partial aggregation makes this a
    single-row shuffle regardless of input size."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum("l_extendedprice").alias("sum_price"),
        money_avg("l_quantity").alias("avg_qty"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tier="P0",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (expands to a two-phase
    aggregate in Catalyst; approx_count_distinct is the scale path
    when exactness isn't required — see agg_approx_distinct)."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tier="P0",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    return customer.select("c_mktsegment", "c_nationkey").distinct()


# The tumbling-window aggregation lives in operators/streaming.py as a
# real streaming query (stream_tumbling_agg) with a batch twin.
