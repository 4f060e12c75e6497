"""Text-analysis operators over the documents table (SURVEY.md §2.11).

Tokenization is split+explode — JVM-side, no UDFs; at 100 TB the
explode fan-out is bounded by document length and the downstream
aggregation is partial+final, so the shuffle carries (lang, token)
partial counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load


@query(
    "text_tokenize_tf",
    oracle="""
    SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    GROUP BY lang, token
    """,
    tier="P0",
)
def tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequency per (lang, token) over whitespace tokens."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
