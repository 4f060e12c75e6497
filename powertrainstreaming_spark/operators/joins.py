"""Join operators (SURVEY.md §2.3).

The reference's join surface is keyed-stream ⋈ static-dimension
(SURVEY.md §0 envelope); here the same shapes are declarative DataFrame
joins so Catalyst picks broadcast vs shuffle strategies.  Explicit
``broadcast()`` hints go ONLY on dimensions with a bounded row count at
any scale factor (region=5, nation=25): a hint overrides
autoBroadcastJoinThreshold, so hinting a linearly-growing dim (supplier,
customer) would force an OOM-sized broadcast at 100 TB.  Growing dims
are left to Catalyst/AQE, which broadcast them while they fit.
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
        # customer grows with scale: no explicit hint (a hint would
        # override the size threshold); AQE broadcasts the filtered
        # side while it fits.
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
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


_Q5_START, _Q5_END = "1996-01-01", "1997-01-01"


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 shape: 5-way join with a composite (multi-key) condition
    — supplier must be in the customer's nation (c_nationkey =
    s_nationkey) on top of the l_suppkey equi-key.

    Join order: facts join on their keys (shuffle); only nation/region
    carry explicit broadcast() hints — they are genuinely bounded dims
    (25/5 rows at any scale factor).  supplier and customer grow
    linearly with scale, and an explicit broadcast() hint OVERRIDES
    autoBroadcastJoinThreshold (it does not fall back by size), so at
    100 TB a hinted supplier would OOM executors.  Catalyst + AQE pick
    broadcast for them automatically while they fit the threshold.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q5_START)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(_Q5_END)))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


query(
    "join_multikey_composite",
    oracle=f"""
    SELECT n_name, {o_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '{_Q5_START}'
      AND o_orderdate <  TIMESTAMP '{_Q5_END}'
    GROUP BY n_name
    """,
    tier="P0",
)(q5_region_revenue)


@query(
    "join_left_right_full",
    oracle="""
    SELECT c_custkey, c_acctbal, o_orderkey, o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    """,
    tier="P0",
)
def join_left_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with filtered sides so nulls appear on both:
    customers without big orders, big orders of low-balance customers."""
    customer = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "full"
    ).select("c_custkey", "c_acctbal", "o_orderkey", "o_totalprice")


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
