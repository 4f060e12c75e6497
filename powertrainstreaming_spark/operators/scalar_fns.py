"""Scalar function operators: string / date / math (SURVEY.md §2.8).

All expressions are built-in `pyspark.sql.functions` — JVM-side inside
whole-stage codegen, no Python workers.  Transcendental results
(ln/exp/pow) are rounded to 6 places per the determinism contract;
integer and string functions are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           substring(p_name, 1, 8) AS name_prefix,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           CAST(length(p_name) AS INT) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           p_brand || '-' || p_type AS brand_type,
           string_split(p_name, ' ')[1] AS first_token,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           trim(' ' || p_type || ' ') AS type_trimmed
    FROM part
    """,
    tier="P0",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        # concat (not concat_ws): '||' in the oracle propagates NULL.
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_token"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit(" "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
               AS days_since_epoch_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders
    """,
    tier="P0",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        # Both sides cast to DATE explicitly: Spark datediff truncates
        # timestamps to dates, DuckDB date_diff on timestamps does not —
        # identical semantics only when both operate on DATE.
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.unix_timestamp(F.col("o_orderdate")).alias("unix_sec"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price_r2,
           abs(l_extendedprice - 50000.0) AS price_dev,
           CAST(ceil(l_quantity * 1.5) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity * 1.5) AS BIGINT) AS qty_floor,
           l_orderkey % 7 AS key_mod7,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           round(pow(l_quantity, 2), 6) AS qty_sq,
           round(sqrt(l_extendedprice), 6) AS price_sqrt
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
    tier="P0",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.abs(F.col("l_extendedprice") - 50000.0).alias("price_dev"),
        F.ceil(F.col("l_quantity") * 1.5).alias("qty_ceil"),
        F.floor(F.col("l_quantity") * 1.5).alias("qty_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.exp(F.col("l_discount")), 6).alias("disc_exp"),
        F.round(F.pow(F.col("l_quantity"), 2), 6).alias("qty_sq"),
        F.round(F.sqrt(F.col("l_extendedprice")), 6).alias("price_sqrt"),
    )
