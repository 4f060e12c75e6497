"""Graph operators over the near-duplicate pair graph (engine
extensions, SURVEY.md §2.12).

Iterative graph algorithms on DataFrames follow one discipline here
(shared with dedup_cluster_cc and the k-means IVF trainer): per round,
one edge⋈rank shuffle join plus one groupBy re-aggregation;
``localCheckpoint`` truncates lineage so the plan stays O(1) deep; the
only driver-side values are bounded scalars (a convergence sum — never
row data).  Rank arithmetic is EXACT DECIMAL, not double: decimal
addition is order-insensitive, so the result is bit-identical no
matter how the shuffle partitions the contributions — which is what
makes an iterative float algorithm golden-snapshot-able at all.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.operators.dedup import (
    _doc_tokens,
    _tau_pairs,
)
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio
_PR_ITERS = 10
_PR_SCALE = "decimal(28,18)"  # 10 integral digits: products with the
# (3,2) damping factor stay inside precision 38, so Spark never
# falls back to its scale-6 precision-overflow truncation


@query("graph_pagerank_neardup", oracle=None, tier="P2")
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate graph — ranking duplicate-
    cluster "centers" (the canonical iterative graph algorithm,
    exercising the capability class beyond label propagation's
    min-semilattice).  Corpus use: within a near-dup family, the
    highest-rank member is the best-connected variant — an alternative
    keep policy to min-id / keep-longest.

    Nodes = all documents; edges = symmetric Jaccard ≥ τ pairs from
    the PPJoin prefix-filtered join (never all-pairs).  Update:
    r'(v) = (1-d)/n + d·(Σ_{u→v} r(u)/deg(u) + dangling/n) with
    d = 85/100 exact; isolated and dangling mass is redistributed
    uniformly so Σr = 1 is a per-round invariant (asserted in the
    property tests, exactly, thanks to decimal arithmetic).  10 fixed
    iterations — PageRank convergence is governed by d, not graph
    size, so the round count does NOT grow at 100 TB; each round is
    one src-keyed equi-join plus one dst-keyed partial+final agg, the
    same two shuffles regardless of scale.

    Rows-only t2 check (iterative — not SQL-expressible); invariants
    (mass conservation, isolated-node uniformity, hub dominance,
    rerun determinism) are property-tested in tests/test_properties.py.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # bounded scalar: node count, one job
    if n == 0:
        # Empty corpus: 1/n and (1-d)/n are undefined — the zero-row
        # relation is the fixpoint, not an error (test_empty_input).
        return spark.createDataFrame(
            [], "doc_id bigint, pagerank double, degree bigint"
        )
    toks = _doc_tokens(spark, sf_dir)
    pairs = _tau_pairs(toks).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select("doc_b", "doc_a"))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    # Every divisor is cast to a NARROW decimal: dividing decimal(38,18)
    # by an int literal makes Spark cap the quotient scale at 6
    # (precision-overflow rule), which leaks ~1e-3 of rank mass per run;
    # narrow-decimal divisors keep quotient scale ~18 so Σranks stays 1
    # to ~1e-9 (property-tested).
    nd = F.lit(n).cast("decimal(12,0)")
    one = F.lit(1).cast(_PR_SCALE)
    # d exact and NARROW (3,2): a wide damping factor makes every d*x
    # product overflow precision 38, and Spark's overflow rule rounds
    # such products at scale 6 — which silently leaked ~1e-3 of rank
    # mass before this was narrowed.
    # Built via decimal.Decimal, never float division: str(85 / 100)
    # happens to render '0.85', but other ratios render like
    # '0.8500000000000001' and would silently change (or fail) the
    # (3,2) cast.  Exact rational → exact literal.
    d = F.lit(str(Decimal(_PR_DAMP_NUM) / Decimal(_PR_DAMP_DEN))).cast(
        "decimal(3,2)"
    )
    base = (one - d) / nd

    ranks = docs.select(
        "doc_id", (one / nd).alias("rank")
    ).localCheckpoint()
    for _ in range(_PR_ITERS):
        # Mass held by dangling (isolated) nodes, redistributed
        # uniformly — attached as an in-plan 1-row broadcast scalar,
        # not a driver collect, so each round is still one DAG.
        dang = (
            ranks.join(deg, ranks.doc_id == deg.src, "left")
            .filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0).cast(_PR_SCALE)).alias("dang"))
        )
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .join(deg, "src")
            .select(
                F.col("dst").alias("doc_id"),
                # deg as a NARROW decimal: dividing decimal(38,18) by
                # bigint(20,0) makes Spark shrink the result scale to 6
                # (precision cap), leaking ~1e-4 of rank mass per run;
                # decimal(9,0) keeps the quotient scale deep enough
                # that Σranks stays 1 to ~1e-9 (property-tested).
                (F.col("rank") / F.col("deg").cast("decimal(9,0)")).alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            docs.join(contrib, "doc_id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "doc_id",
                (
                    base
                    + d
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0).cast(_PR_SCALE))
                        + F.col("dang") / nd
                    )
                ).cast(_PR_SCALE).alias("rank"),
            )
            .localCheckpoint()
        )
    deg_out = deg.select(F.col("src").alias("doc_id"), "deg")
    return ranks.join(deg_out, "doc_id", "left").select(
        "doc_id",
        F.col("rank").cast("double").alias("pagerank"),
        F.coalesce(F.col("deg"), F.lit(0)).cast("bigint").alias("degree"),
    )
