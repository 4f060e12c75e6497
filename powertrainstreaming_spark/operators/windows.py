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
