"""Join operators (SURVEY.md §2.3).

The reference's join surface is keyed-stream ⋈ static-dimension
(SURVEY.md §0 envelope); here the same shapes are declarative DataFrame
joins so Catalyst picks broadcast vs shuffle strategies, with explicit
``broadcast()`` hints on dimensions small enough to replicate even at
100 TB fact scale (region/nation/customer dims grow ~linearly but stay
orders of magnitude below lineitem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import money_sum, o_money_sum
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

_Q3_CUTOFF = "1998-06-15"


def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (M1 slice, SURVEY.md §7.2): TPC-H q3 shape.

    customer(BUILDING) ⋈ orders(< cutoff) ⋈ lineitem(shipped > cutoff)
    → revenue per order → top-10.  Exercises pushdown, broadcast + SMJ
    joins, partial/final hash agg, the decimal money contract, and
    TakeOrderedAndProject top-k with unique-key tiebreak.
    """
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit(_Q3_CUTOFF))
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit(_Q3_CUTOFF))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer is the small filtered side — broadcast it so the big
        # fact join needs no extra shuffle for the dimension.
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


query(
    "join_shuffle_equi",
    oracle=f"""
    SELECT l_orderkey, o_orderdate,
           {o_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
      AND l_shipdate  > TIMESTAMP '{_Q3_CUTOFF}'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tier="P0",
)(q3_top_unshipped)


@query(
    "join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    tier="P0",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation ⋈ broadcast(region): the canonical small-dim join."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")
