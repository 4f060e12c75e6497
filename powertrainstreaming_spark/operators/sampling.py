"""Deterministic sampling operators for training-data pipelines.

Sampling at 100 TB must be (a) reproducible — rerunning over a
re-partitioned or re-sharded copy of the corpus must keep exactly the
same rows, so no RNG seeded per-partition (`df.sample` keeps different
rows when the split layout changes), and (b) map-only — the keep/drop
decision reads nothing but the row itself.  Both operators key the
decision on a hash computed in exact int64 arithmetic, so the kept set
is bit-identical in any engine (full DuckDB value-hash oracle) and
stable across reruns, shards, and engines — which is what makes a
sampled training set auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import (
    POLY_M,
    o_poly_hash,
    poly_hash,
)
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

# Knuth multiplicative constant + a small odd mixer for the line number.
_MIX_A = 2654435761
_MIX_B = 40503
_SAMPLE_PCT = 10  # keep 10% of lineitem

# Reducing the key mod POLY_M (< 2^30) BEFORE multiplying keeps the
# product under 2^62 even for arbitrarily large order keys, so the
# arithmetic never overflows int64 on either engine.
_BERNOULLI_ORACLE = f"""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE (((l_orderkey % {POLY_M}) * {_MIX_A}
            + CAST(l_linenumber AS BIGINT) * {_MIX_B}) % {POLY_M}) % 100
          < {_SAMPLE_PCT}
    """


@query("sample_bernoulli_hash", oracle=_BERNOULLI_ORACLE, tier="P1")
def sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample of lineitem keyed on a primary-key hash.

    The keep/drop predicate is a pure row-local int64 expression, so
    the plan is a map-only filtered scan (pushdown-eligible, no
    shuffle, no RNG state) and the SAME rows are kept on any engine,
    any partitioning, any rerun — unlike ``df.sample``, whose output
    depends on the physical split layout.  At 100 TB this is the only
    sampling design whose output can be reproduced for an audit.
    """
    li = load(spark, sf_dir, "lineitem")
    h = (
        (F.col("l_orderkey") % POLY_M) * F.lit(_MIX_A).cast("bigint")
        + F.col("l_linenumber").cast("bigint") * _MIX_B
    ) % POLY_M
    return li.filter((h % 100) < _SAMPLE_PCT).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


_STRATUM_CAP = 100  # target docs per language

_STRATIFIED_ORACLE = f"""
    WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
                 FROM documents GROUP BY lang)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN cnt USING (lang)
    WHERE ({o_poly_hash('d.text')} % 10000)
          < CAST(floor(least(1.0, {_STRATUM_CAP} / (n * 1.0)) * 10000) AS BIGINT)
    """


@query("sample_stratified", oracle=_STRATIFIED_ORACLE, tier="P1")
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language proportional downsampling toward a target stratum
    size — the corpus-balancing step of a training-data pipeline.

    Per-stratum keep fraction = min(1, cap / count); rows are kept when
    their content hash falls under the fraction, so over-represented
    languages are thinned to ~cap docs in expectation while small
    strata pass through whole.  Content-hash (not key-hash) keeping
    means byte-identical duplicates sample identically.

    Scale shape: one tiny aggregate (one row per language — bounded by
    the number of languages on Earth, so broadcastable by contract,
    unlike anything that grows with corpus size) broadcast-joined back,
    then a map-only filter.  No window, no per-stratum sort — the
    per-group top-k alternative shuffles and sorts every stratum, which
    is exactly what skewed languages can't afford at 100 TB.
    """
    docs = load(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    frac = F.least(F.lit(1.0), F.lit(_STRATUM_CAP) / F.col("n"))
    thresh = F.floor(frac * 10000).cast("bigint")
    return (
        docs.join(F.broadcast(cnt), "lang")
        .filter((poly_hash("text") % 10000) < thresh)
        .select("doc_id", "lang", "source", "n_chars")
    )


_IMP_SCALE = 1000  # acceptance ~ n_chars / 1000, capped at 1
_IMP_MOD = 1_000_000


@query(
    "sample_importance_weighted",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars,
           CAST({o_poly_hash("CAST(doc_id AS VARCHAR)")} % {_IMP_MOD}
                AS BIGINT) AS u,
           CAST(LEAST(CAST(n_chars AS BIGINT) * {_IMP_SCALE},
                      {_IMP_MOD}) AS BIGINT) AS threshold
    FROM documents
    WHERE {o_poly_hash("CAST(doc_id AS VARCHAR)")} % {_IMP_MOD}
          < LEAST(CAST(n_chars AS BIGINT) * {_IMP_SCALE}, {_IMP_MOD})
    """,
    tier="P2",
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: keep each document
    with probability proportional to its weight (here n_chars/1000,
    capped at 1) — the corpus-curation move that up-samples long/
    high-quality documents without an RNG.

    The accept test compares a per-row poly-hash uniform (exact int64
    arithmetic, bit-identical across engines — module docstring) to an
    integer threshold derived from the weight, so the decision is
    map-only, reproducible under re-sharding, and auditable: the query
    emits u and threshold alongside the kept row, making every keep
    decision independently re-checkable.  At 100 TB this is a codegen
    filter on the scan — no shuffle, no driver state, and the expected
    sample size is sum(w)/scale regardless of partitioning.
    """
    docs = load(spark, sf_dir, "documents")
    u = poly_hash(F.col("doc_id").cast("string")) % _IMP_MOD
    # bigint BEFORE the multiply: n_chars * 1000 in 32-bit overflows
    # for documents longer than ~2.1M chars (ANSI-mode job abort).
    threshold = F.least(
        F.col("n_chars").cast("bigint") * _IMP_SCALE, F.lit(_IMP_MOD)
    ).cast("bigint")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        u.cast("bigint").alias("u"),
        threshold.alias("threshold"),
    ).filter(F.col("u") < F.col("threshold"))


_CAP_K = 100  # exact per-language cap


@query(
    "sample_topk_per_group",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars, rn
    FROM (
        SELECT doc_id, lang, source, n_chars,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {o_poly_hash('text')}, doc_id
               ) AS BIGINT) AS rn
        FROM documents
    )
    WHERE rn <= {_CAP_K}
    """,
    tier="P2",
)
def sample_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-stratum cap: keep precisely min(K, |stratum|) docs per
    language, chosen by content-hash rank — the deterministic
    "reservoir sample" of corpus curation (sample_stratified keeps
    ~cap docs in expectation; budget accounting sometimes needs the
    exact count).

    Ranking by poly_hash(text) (doc_id tiebreak) instead of an RNG
    makes the kept set a pure function of content: reproducible across
    engines, reruns, and re-shardings, and byte-identical duplicates
    rank adjacently.  The plan is one hash shuffle on lang + a
    per-partition top-K sort; at 100 TB swap the full window sort for
    a two-phase top-K (per-partition rank-truncate to K before the
    shuffle — Spark's TakeOrderedAndProject generalized per group) if
    a stratum's row count dwarfs K; the emitted rn column keeps every
    keep decision auditable.
    """
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(poly_hash("text"), F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= _CAP_K)
    )
