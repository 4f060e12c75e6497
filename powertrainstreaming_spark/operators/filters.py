"""Projection / filter / predicate operators (SURVEY.md §2.2).

All predicates are declarative Column expressions so Catalyst pushes
them into the parquet scan (`PushedFilters` in `.explain`) — at 100 TB
row-group min/max statistics skip most of the input before it is
decoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_quantity * 2.5 AS qty_scaled,
           l_returnflag || '/' || l_linestatus AS flag_status
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    tier="P0",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select + computed columns + alias; raw double products are
    bit-identical across engines (IEEE), so no rounding needed."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_quantity") * 2.5).alias("qty_scaled"),
        # F.concat (NULL-propagating) mirrors SQL '||'; concat_ws would
        # skip NULLs and silently diverge from the oracle on null input.
        F.concat(F.col("l_returnflag"), F.lit("/"), F.col("l_linestatus")).alias(
            "flag_status"
        ),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06)
       OR (NOT l_returnflag = 'A' AND l_extendedprice < 2000)
    """,
    tier="P0",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_quantity") > 30) & F.col("l_discount").between(0.02, 0.06)
    ) | (~(F.col("l_returnflag") == "A") & (F.col("l_extendedprice") < 2000))
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@query(
    "filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_size BETWEEN 10 AND 30
      AND p_name LIKE '%a%'
    """,
    tier="P0",
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("p_name").like("%a%")
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "filter_null_semantics",
    oracle="""
    SELECT o_orderkey, status_or_null,
           (status_or_null IS NULL) AS is_missing,
           (status_or_null IS NOT DISTINCT FROM 'F') AS nullsafe_is_f
    FROM (
        SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_or_null
        FROM orders
    )
    WHERE status_or_null IS NULL OR status_or_null = 'F'
    """,
    tier="P1",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL / null-safe equality (<=>); fixtures have
    no native nulls, so nullif derives them."""
    orders = load(spark, sf_dir, "orders")
    withnull = orders.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null")
    )
    return withnull.filter(
        F.col("status_or_null").isNull() | (F.col("status_or_null") == "F")
    ).select(
        "o_orderkey",
        "status_or_null",
        F.col("status_or_null").isNull().alias("is_missing"),
        F.col("status_or_null").eqNullSafe(F.lit("F")).alias("nullsafe_is_f"),
    )


@query(
    "case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                WHEN o_totalprice < 400000 THEN 'large'
                ELSE 'jumbo' END AS price_band,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
    tier="P0",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .when(F.col("o_totalprice") < 400000, "large")
        .otherwise("jumbo")
    )
    return orders.groupBy(band.alias("price_band"), F.col("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


_SCALAR_SUBQ_SQL = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM {orders} o
    WHERE o.o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*)
           FROM {orders})
      AND o.o_totalprice >
          2 * (SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,6)))
                           AS DOUBLE) / COUNT(*)
               FROM {orders} i WHERE i.o_custkey = o.o_custkey)
"""


@query(
    "filter_scalar_subquery",
    oracle=_SCALAR_SUBQ_SQL.format(orders="orders"),
    tier="P2",
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries in a predicate — one uncorrelated (global
    average price) and one correlated (the customer's own average):
    orders beating both the market and 2x their customer's habit.

    Textually identical SQL runs on both engines.  Catalyst lowers the
    uncorrelated scalar to a one-row broadcast (a single extra agg
    pass, then a map-side filter) and DECORRELATES the per-customer
    scalar into an aggregate + equi-join on o_custkey — no per-row
    re-execution, so at 100 TB the cost is one extra shuffle keyed on
    the correlation column, identical physics to writing the join by
    hand.  Both averages are exact decimal sums ÷ counts, so the
    comparison boundary is the same bit-identical double in both
    engines (exprs.py rule 1).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("pts_ssq_orders")
    return spark.sql(_SCALAR_SUBQ_SQL.format(orders="pts_ssq_orders"))
