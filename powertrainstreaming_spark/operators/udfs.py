"""UDF / UDAF / UDTF surface (SURVEY.md §2.9).

Extensibility contract demonstrated at every Python-boundary level:

- plain Python UDF  (row-at-a-time, pickled — the SLOW path, kept
  only to prove the surface; same logic is expressible as a CASE)
- pandas scalar UDF (Arrow-batched, vectorized — 10-100× the plain
  UDF; the acceptable Python hot path)
- pandas grouped-agg UDF (custom aggregate per group)
- applyInPandas      (per-group DataFrame→DataFrame, UDTF-like)
- mapInPandas        (partition-wise DataFrame→DataFrame)

Determinism: every UDF here computes order-insensitive values (pure
per-row functions, or min/max-based group statistics) so results
hash-match the SQL oracle regardless of row order within Arrow
batches or groups.

100 TB note: each Python stage is a process boundary (executor JVM ↔
Python worker over Arrow).  The plans keep those stages narrow —
project only needed columns into the UDF — and everything before and
after stays JVM-side.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

# Worker-side callables in this module are shipped pickled BY VALUE, so
# executors never need this package importable (the external driver's
# cwd / PYTHONPATH is not ours to control — found via an sf0.1 sweep run
# from a foreign cwd, where every worker raised ModuleNotFoundError).
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

# ---------------------------------------------------------------------------
# Plain Python scalar UDF


def _price_band(total: float) -> str:
    if total < 100000:
        return "small"
    if total < 250000:
        return "medium"
    if total < 400000:
        return "large"
    return "jumbo"


@query(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                WHEN o_totalprice < 400000 THEN 'large'
                ELSE 'jumbo' END AS band
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    tier="P1",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (price banding), oracle-checked against
    the equivalent CASE expression.  This is deliberately the slow path
    — BatchEvalPythonExec pickles every row; use it only for logic that
    genuinely can't be a Column expression or a pandas UDF."""
    band = F.udf(_price_band, StringType())
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return orders.select("o_orderkey", band("o_totalprice").alias("band"))


# ---------------------------------------------------------------------------
# Pandas (Arrow-vectorized) scalar UDF


@F.pandas_udf(DoubleType())
def _disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    # Element-wise IEEE double ops — bit-identical to the SQL expression.
    return price * (1.0 - discount)


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
    tier="P1",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched vectorized UDF (Series→Series) computing the
    discounted price; ArrowEvalPythonExec transfers columnar batches,
    and numpy does the arithmetic — the pattern that makes Python
    tolerable in a hot path."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


# ---------------------------------------------------------------------------
# Pandas grouped-aggregate UDF


@F.pandas_udf(DoubleType())
def _midrange(v: pd.Series) -> float:
    # (max+min)/2 — order-insensitive, so deterministic under shuffles.
    return float((v.max() + v.min()) / 2.0)


@F.pandas_udf(LongType())
def _count_rows(v: pd.Series) -> int:
    # Catalyst forbids mixing GROUPED_AGG pandas UDFs with JVM
    # aggregates in one agg() — so the count is a pandas UDF too.
    return int(len(v))


@query(
    "udaf_pandas_grouped",
    oracle="""
    SELECT event_type,
           round((MAX(value) + MIN(value)) / 2.0, 6) AS value_midrange,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tier="P2",
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate (midrange) as a GROUPED_AGG pandas UDF.
    The statistic is min/max-based on purpose: a float *sum* inside a
    UDAF would depend on intra-group row order and break the
    cross-engine hash."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(_midrange("value"), 6).alias("value_midrange"),
        _count_rows("value").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# applyInPandas — per-group DataFrame→DataFrame (UDTF-like)

_NORM_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, value DOUBLE, value_norm DOUBLE"
)


def _minmax_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    lo, hi = pdf["value"].min(), pdf["value"].max()
    span = hi - lo
    norm = (pdf["value"] - lo) / span if span > 0 else pdf["value"] * 0.0
    # NO rounding: (v-lo)/span is the identical IEEE double expression
    # on both engines, so the raw value is bit-exact — while pandas
    # .round() is half-EVEN and would diverge from SQL round() on
    # exact binary boundaries (bit us at sf0.1: 0.2890625).
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value": pdf["value"],
            "value_norm": norm.astype(float),
        }
    )


@query(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id, value,
           CASE WHEN mx > mn THEN (value - mn) / (mx - mn)
                ELSE 0.0 END AS value_norm
    FROM (
        SELECT event_id, user_id, value,
               MIN(value) OVER (PARTITION BY user_id) AS mn,
               MAX(value) OVER (PARTITION BY user_id) AS mx
        FROM events
    )
    """,
    tier="P2",
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user min-max normalization via applyInPandas: each user's
    events arrive as one pandas DataFrame, the function returns a new
    frame (UDTF shape).  Oracle is the window-SQL equivalent.  The
    shuffle is one hash partition on user_id — same cost as a window,
    plus the Arrow boundary."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return events.groupBy("user_id").applyInPandas(_minmax_normalize, _NORM_SCHEMA)


# ---------------------------------------------------------------------------
# mapInPandas — partition-wise DataFrame→DataFrame


def _double_big_values(batches):
    for pdf in batches:
        out = pdf[pdf["value"] > 100.0].copy()
        out["value_x2"] = out["value"] * 2.0
        yield out[["event_id", "event_type", "value", "value_x2"]]


@query(
    "udtf_map_in_pandas",
    oracle="""
    SELECT event_id, event_type, value, value * 2.0 AS value_x2
    FROM events
    WHERE value > 100.0
    """,
    tier="P2",
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise filter+project in pandas (mapInPandas): the
    function sees an iterator of Arrow batches per partition — no
    shuffle at all, pure map-side Python.  Element-wise double ops are
    bit-identical to the SQL expression."""
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return events.mapInPandas(
        _double_big_values,
        "event_id BIGINT, event_type STRING, value DOUBLE, value_x2 DOUBLE",
    )
