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


@query(
    "text_stats_lang",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
           CAST(SUM(length(text)) AS BIGINT) AS total_text_len
    FROM documents
    GROUP BY lang, source
    """,
    tier="P1",
)
def text_stats_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus statistics — the profiling pass every
    training-data pipeline runs first.

    All sums are over BIGINT (exact, order-insensitive); the average is
    exact-int-sum ÷ count in double, so no decimal contract is needed.
    Partial+final hash agg: the shuffle carries one row per group.
    """
    docs = load(spark, sf_dir, "documents")
    n_chars_sum = F.sum("n_chars").cast("bigint")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_chars_sum.alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(n_chars_sum.cast("double") / F.count(F.lit(1)), 6).alias("avg_chars"),
        F.sum(F.length("text")).cast("bigint").alias("total_text_len"),
    )


_KEYWORD = "spark"


@query(
    "text_keyword_filter",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars,
           CAST(length(text) AS BIGINT) AS text_len,
           (CAST(length(text) AS BIGINT) = n_chars) AS len_matches
    FROM documents
    WHERE contains(text, '{_KEYWORD}')
    """,
    tier="P1",
)
def text_keyword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-containment filter with an n_chars recheck — the
    quality-gate shape (find docs mentioning X, verify stored metadata
    against recomputed values).  `contains` stays a JVM string predicate
    inside codegen; no regex engine unless the pattern needs one.
    """
    docs = load(spark, sf_dir, "documents")
    text_len = F.length("text").cast("bigint")
    return docs.filter(F.col("text").contains(_KEYWORD)).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        text_len.alias("text_len"),
        (text_len == F.col("n_chars")).alias("len_matches"),
    )
