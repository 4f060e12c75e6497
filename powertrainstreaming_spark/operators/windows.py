"""Window-function operators (SURVEY.md §2.5, §2.6).

Every Window.orderBy carries a unique-key tiebreak so ranked output is
a total order (determinism contract §5.3 rule 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load


@query(
    "win_row_number_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS INT) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    tier="P0",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by totalprice (rank tiebroken by key).

    100 TB note: partitionBy(o_custkey) shuffles once on the group key;
    no global sort.  Skewed customers are handled by AQE skew splitting.
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(ts)  OVER w AS prev_ts,
           lead(ts) OVER w AS next_ts,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tier="P0",
)
def lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap via lag/lead — the reference's
    per-vehicle consecutive-reading delta, keyed-shuffle once on
    user_id.  Gap in integer microseconds: exact across engines."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        prev_ts.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).alias("gap_us"),
    )


@query(
    "sort_multi_nulls",
    oracle="""
    SELECT o_orderkey, status_or_null, o_totalprice
    FROM (
        SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null,
               o_totalprice
        FROM orders
    )
    ORDER BY status_or_null DESC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tier="P0",
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit null placement + limit; the
    ORDER BY ends in the unique key so the limited set is total-ordered
    (determinism contract §5.3 rule 4)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.col("status_or_null").desc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tier="P0",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price.

    orderBy().limit() lowers to TakeOrderedAndProjectExec: per-partition
    heaps + a k-row merge on the driver — no global sort even at 100 TB.
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
