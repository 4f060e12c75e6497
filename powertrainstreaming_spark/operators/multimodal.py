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
