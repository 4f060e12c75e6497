"""Deduplication operators over the documents corpus (SURVEY.md §2.11).

Exact dedup is the first stage of every LLM training-data pipeline:
hash-group on the content key, keep one deterministic representative
per group.  At 100 TB this is a single shuffle on the dedup key with
map-side partial aggregation — never a window sort, and never a
driver-side pass.

The fixtures have no exact duplicate texts at sf≤0.01 (SURVEY.md:300),
so duplicates are synthesized with a self-union; at sf0.1 the corpus
carries real duplicate texts (4992 distinct / 5000 rows [MEASURED]),
which is why the representative must be deterministic (min doc_id via
min_by), not whatever row dropDuplicates happens to keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load


@query(
    "dedup_exact",
    oracle="""
    SELECT text,
           arg_min(doc_id, doc_id) AS doc_id,
           arg_min(lang, doc_id) AS lang,
           arg_min(source, doc_id) AS source,
           arg_min(n_chars, doc_id) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    GROUP BY text
    """,
    tier="P1",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate removal on documents.text, keeping the min-doc_id
    representative and a copy count.

    ``dropDuplicates(['text'])`` is the one-liner form, but its kept row
    is arbitrary; ``min_by(col, doc_id)`` pins the representative so the
    result is deterministic even when distinct doc_ids share a text (as
    they do at sf0.1).  groupBy+min_by partial-aggregates map-side, so
    the shuffle carries one candidate row per (partition, text) — the
    scalable exact-dedup plan.
    """
    docs = load(spark, sf_dir, "documents")
    uni = docs.unionAll(docs)
    return uni.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("source", "doc_id").alias("source"),
        F.min_by("n_chars", "doc_id").alias("n_chars"),
        F.count(F.lit(1)).alias("n_copies"),
    )
