"""Multimodal pipeline operators (SURVEY.md §2.11).

The multimodal pattern: one table per modality, joined on a shared id,
with per-modality feature extraction fused into the same job.  Here the
modalities are text (documents) and vectors (embeddings); binary
image/audio columns follow the same plumbing with Pandas-UDF decode
stages.

100 TB note: documents:embeddings is NOT 1:1 beyond sf0.01 (5000:2000
at sf0.1 [MEASURED], SURVEY.md:306) — the join is a plain inner
equi-join on the id, both sides growing, so no broadcast hint: AQE
picks the strategy per actual size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import dot_f, o_dot, sim_round
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load


@query(
    "multimodal_join",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
           CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
           round({o_dot('e.embedding', 'e.embedding')}, 6) AS emb_norm_sq
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    tier="P1",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on doc_id = vec_id with per-modality
    derived features in one pipeline: token count from the text side,
    vector norm from the embedding side, label carried through.

    Inner join — the doc:emb id sets diverge at sf0.1 (5000:2000), so
    inner semantics (only ids present in both) is the meaningful
    contract at every scale.
    """
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "label",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
            sim_round(dot_f("embedding", "embedding")).alias("emb_norm_sq"),
        )
    )


_NEG_PER_POS = 2
_NEG_A = 131
_NEG_B = 9973


@query(
    "multimodal_contrastive_pairs",
    oracle=f"""
    WITH mx AS (SELECT MAX(vec_id) AS max_vec FROM embeddings),
    pos AS (
        SELECT d.doc_id, e.vec_id
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    negk AS (
        SELECT doc_id, j,
               (doc_id * {_NEG_A} + j * {_NEG_B}) % (max_vec + 1) AS cand
        FROM pos, mx,
             LATERAL (SELECT unnest(range(1, {_NEG_PER_POS} + 1)) AS j) u
        WHERE (doc_id * {_NEG_A} + j * {_NEG_B}) % (max_vec + 1) != doc_id
    )
    SELECT doc_id, vec_id, CAST(0 AS BIGINT) AS j, TRUE AS is_positive
    FROM pos
    UNION ALL
    SELECT n.doc_id, e.vec_id, CAST(n.j AS BIGINT) AS j, FALSE AS is_positive
    FROM negk n JOIN embeddings e ON n.cand = e.vec_id
    """,
    tier="P2",
)
def multimodal_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair construction (CLIP-style): each
    (document, matching embedding) positive plus 2 (_NEG_PER_POS)
    DETERMINISTIC hash-picked negatives per anchor — the pair builder
    for contrastive multimodal training, reproducible under
    re-sharding because negatives come from arithmetic on the anchor
    id, not an RNG.

    Negative candidates are (doc_id*a + j*b) mod (max_id+1), re-joined
    to the embeddings table so only EXISTING ids survive (no
    contiguous-id assumption), with accidental self-matches filtered.
    max_id rides as an in-plan one-row broadcast.  Cost: the positive
    equi-join plus one negatives equi-join keyed on the candidate id —
    per-anchor fan-out is the fixed constant k, so pair volume is
    k+1 per anchor at any corpus size, never quadratic.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    emb_ids = load(spark, sf_dir, "embeddings").select("vec_id")
    mx = load(spark, sf_dir, "embeddings").agg(F.max("vec_id").alias("max_vec"))
    pos = docs.join(emb_ids, docs.doc_id == emb_ids.vec_id).select(
        "doc_id",
        "vec_id",
        F.lit(0).cast("bigint").alias("j"),
        F.lit(True).alias("is_positive"),
    )
    negs = (
        pos.select("doc_id")
        .crossJoin(F.broadcast(mx))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.lit(_NEG_PER_POS))).alias("j"),
            "max_vec",
        )
        .withColumn("j", F.col("j").cast("bigint"))
        .withColumn(
            "cand",
            F.pmod(
                F.col("doc_id") * _NEG_A + F.col("j") * _NEG_B,
                F.col("max_vec") + 1,
            ),
        )
        .filter(F.col("cand") != F.col("doc_id"))
        .join(emb_ids, F.col("cand") == F.col("vec_id"))
        .select("doc_id", "vec_id", "j", F.lit(False).alias("is_positive"))
    )
    return pos.unionByName(negs)
