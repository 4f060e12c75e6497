"""Similarity-search operators (SURVEY.md §2.11).

Embeddings are unit-normalized (FIXTURES.md), so cosine similarity ≡
dot product.  All dot products run through ``exprs.dot_f`` — pure
higher-order functions, JVM-side, no Python workers.

100 TB design: the brute-force probe scan is O(n) and embarrassingly
parallel (fine at any scale for a single probe).  All-pairs variants
must never materialize O(n²): they block on ``label`` (or LSH band)
so each bucket's cross-join is small and the blocking key drives the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import dot_f, o_dot, sim_round
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

_PROBE_VEC_ID = 0


@query(
    "sim_knn_bruteforce",
    oracle=f"""
    SELECT e.vec_id, e.label,
           round({o_dot('e.embedding', 'p.embedding')}, 6) AS sim
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_PROBE_VEC_ID}) p
    WHERE e.vec_id != {_PROBE_VEC_ID}
    ORDER BY sim DESC, e.vec_id
    LIMIT 10
    """,
    tier="P0",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest neighbours of probe vec_id=0 by cosine (≡ dot).

    The probe is a 1-row broadcast cross join — at cluster scale this
    is a map-only scan over the embedding table plus a k-row top-k.
    """
    emb = load(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == _PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_embedding")
    )
    return (
        emb.filter(F.col("vec_id") != _PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            sim_round(dot_f("embedding", "probe_embedding")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(10)
    )
