"""Set operations (SURVEY.md §2.7).

union is the canonical incremental-load pattern (append today's
partition to the table); intersect/except compile to semi/anti-style
hash joins under Catalyst, so the same blocked-join scale behavior
applies — no sorts, shuffle on the full row hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

# Overlapping halves of lineitem: [0, 4000] and [2000, inf) on the
# order key, so union-all double-counts the overlap and union-distinct
# collapses it — the difference is the point of the test.
_LO_MAX = 4000
_HI_MIN = 2000

_HALVES_SQL = f"""
    half_a AS (SELECT l_orderkey, l_linenumber FROM lineitem
               WHERE l_orderkey <= {_LO_MAX}),
    half_b AS (SELECT l_orderkey, l_linenumber FROM lineitem
               WHERE l_orderkey >= {_HI_MIN})
"""


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return (
        li.filter(F.col("l_orderkey") <= _LO_MAX),
        li.filter(F.col("l_orderkey") >= _HI_MIN),
    )


@query(
    "set_union_all",
    oracle=f"""
    WITH {_HALVES_SQL}
    SELECT l_orderkey, l_linenumber,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM (SELECT * FROM half_a UNION ALL SELECT * FROM half_b)
    GROUP BY l_orderkey, l_linenumber
    """,
    tier="P1",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of overlapping halves, counted per key — rows in the
    overlap window show n_copies=2, proving bag (not set) semantics.
    unionAll is a zero-shuffle concatenation of the inputs' partitions;
    only the verification count shuffles."""
    a, b = _halves(spark, sf_dir)
    return a.unionAll(b).groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("n_copies")
    )


@query(
    "set_union_distinct",
    oracle=f"""
    WITH {_HALVES_SQL}
    SELECT l_orderkey, l_linenumber FROM half_a
    UNION
    SELECT l_orderkey, l_linenumber FROM half_b
    """,
    tier="P1",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): the overlap collapses; equals a plain scan of
    the combined key range."""
    a, b = _halves(spark, sf_dir)
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    tier="P1",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys in BUILDING ∩ high-balance custkeys (INTERSECT is
    distinct by definition; Catalyst compiles it to a left-semi hash
    join over distinct inputs)."""
    customer = load(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return building.intersect(rich)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tier="P1",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys with orders minus custkeys with urgent orders (EXCEPT
    distinct ≡ left-anti join on distinct inputs)."""
    orders = load(spark, sf_dir, "orders")
    with_orders = orders.select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return with_orders.subtract(urgent)


@query(
    "set_union_by_name",
    oracle="""
    SELECT doc_id, lang, n_chars, CAST(NULL AS VARCHAR) AS source
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars, source
    FROM documents WHERE doc_id % 2 = 1
    """,
    tier="P2",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union: combine an OLD-generation slice
    (no `source` column yet) with a new-generation slice via
    unionByName(allowMissingColumns=True) — the DataFrame-side answer
    to additive schema evolution (`scan_schema_evolution` is the
    storage-side answer via mergeSchema).

    Positional union would silently mis-align columns the moment two
    generations order fields differently; name-based union aligns by
    name and null-fills what the older shard lacks.  Pure narrow op:
    no shuffle, partitions concatenate, so incremental loads at 100 TB
    pay nothing beyond the scans.
    """
    docs = load(spark, sf_dir, "documents")
    old_gen = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "n_chars"
    )
    new_gen = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars", "source"
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True)
