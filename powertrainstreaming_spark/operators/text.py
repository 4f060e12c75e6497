"""Text-analysis operators over the documents table (SURVEY.md §2.11).

Tokenization is split+explode — JVM-side, no UDFs; at 100 TB the
explode fan-out is bounded by document length and the downstream
aggregation is partial+final, so the shuffle carries (lang, token)
partial counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import (
    POLY_B2,
    POLY_M2,
    o_poly_hash,
    poly_hash,
)
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
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
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
        # No round: identical exact-int operands divided identically on
        # both engines → bit-exact double (rounding identical-operand
        # math only ADDS boundary-divergence risk; see win_percent_cume).
        (n_chars_sum.cast("double") / F.count(F.lit(1))).alias("avg_chars"),
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


@query(
    "text_ngram",
    oracle="""
    SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT lang,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
    )
    GROUP BY lang, bigram
    """,
    tier="P2",
)
def text_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts per lang.  Bigrams are built by zipping the token
    array with its own tail (zip_with over two slices) — pure JVM
    higher-order functions, no explode until the bigram level.
    sequence() is deliberately avoided: Spark's sequence(1, 0) counts
    DOWN, silently fabricating bigrams for 1-token docs."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_TFIDF_K = 5


@query(
    "text_tfidf",
    oracle=f"""
    WITH n_docs AS (SELECT COUNT(*) AS n FROM documents),
    tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
            FROM documents),
    tf AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY source, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    scored AS (
        SELECT tf.source, tf.token, tf.tf,
               round(tf.tf * ln(CAST(n_docs.n AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n_docs
    )
    SELECT source, token, tf, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY tfidf DESC, token) AS rn
          FROM scored)
    WHERE rn <= {_TFIDF_K}
    """,
    tier="P2",
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} tf-idf terms per source: two-level aggregation (term
    frequency per source, document frequency per term) joined and
    scored, window top-k with token tiebreak.

    The df side is one row per vocabulary word — small, but it GROWS
    with the corpus (web-text vocabularies never saturate: typos,
    URLs, numbers), so it carries no broadcast hint; AQE broadcasts it
    while it fits and falls back to a token-keyed shuffle join past
    that.  Either way tf-idf scales as two aggregations + one join.
    """
    docs = load(spark, sf_dir, "documents")
    # N as an in-plan 1-row broadcast, not a driver-side count(): the
    # builder stays action-free and N rides the same job as the score.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tok = docs.select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "source",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_K)
        .select("source", "token", "tf", "tfidf")
    )


_STOPWORDS = ("the", "a", "and", "of", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS INT)
               AS n_word_tokens,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ({_STOP_SQL}))) AS INT) AS n_stopwords,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ({_STOP_SQL}))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9_ ]')) AS DOUBLE)
               / length(text) AS punct_ratio,
           CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                          t -> t IN ({_STOP_SQL}))) AS DOUBLE)
                     / len(string_split(text, ' ')) > 0.05
                THEN 'en_like' ELSE 'other' END AS lang_guess
    FROM documents
    """,
    tier="P1",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics for training-data filtering:
    whitespace token count, word-regex token count (the BPE-ish
    pre-tokenizer shape), stopword count/ratio, punctuation ratio, and
    a stopword-ratio language guess (n-gram-free lang-ID heuristic).

    Everything is a JVM expression (split / regexp_extract_all /
    higher-order filter) — a quality pass over 100 TB is a map-only
    scan with no shuffle at all.
    """
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z0-9_]+"), 0)).alias(
            "n_word_tokens"
        ),
        n_stop.alias("n_stopwords"),
        # Raw ratios, no round: identical small-int divisions on both
        # engines are bit-exact; round() would diverge on exact binary
        # boundaries (k/128-style rationals).
        stop_ratio.alias("stopword_ratio"),
        (
            F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9_ ]"), 0)).cast("double")
            / F.length("text")
        ).alias("punct_ratio"),
        F.when(stop_ratio > 0.05, "en_like").otherwise("other").alias("lang_guess"),
    )


FP_BITS = 60  # 30 bits from each independent polynomial hash

_FINGERPRINT_ORACLE = f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    th AS (SELECT doc_id,
                  {o_poly_hash('token')} * 1073741824
                  + {o_poly_hash('token', base=POLY_B2, mod=POLY_M2)} AS h
           FROM toks),
    bits AS (SELECT doc_id, h, unnest(range(0, {FP_BITS})) AS bit FROM th),
    votes AS (SELECT doc_id, bit,
                     CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
              FROM bits),
    s AS (SELECT doc_id, bit, SUM(vote) AS s FROM votes GROUP BY doc_id, bit)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM s GROUP BY doc_id
    """


@query("text_fingerprint", oracle=_FINGERPRINT_ORACLE, tier="P2")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{bits}-bit SimHash document fingerprint from distinct-token
    hashes.  Token hashing concatenates two independent 30-bit
    cross-engine-exact polynomial hashes (exprs.poly_hash, bases
    131/137, moduli 1e9+7/999999937), so the fingerprint is replicated
    bit-for-bit by the DuckDB oracle — full value-hash driver check
    (xxhash64 is the production swap-in where verifiability isn't
    needed); determinism/collision properties additionally covered by
    tests/test_properties.py.

    Plan: distinct (doc, token) → poly-hash pair → explode {bits} bit
    positions → per-(doc, bit) signed vote → fingerprint = Σ 2^i over
    positive bits.  All JVM-side; the shuffle carries (doc, bit)
    partial sums.  At 100 TB the {bits}× bit fan-out happens AFTER
    token dedup and before the only shuffle, and near-dup search over
    fingerprints is a Hamming-ball band join (split the bits into
    bands, exact-match bands as the block key) — same blocked-join
    scaling as MinHash.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("token")
    )
    hashed = tok.select(
        "doc_id",
        (
            poly_hash("token") * F.lit(1073741824).cast("bigint")
            + poly_hash("token", base=POLY_B2, mod=POLY_M2)
        ).alias("h"),
    )
    bits = hashed.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(FP_BITS - 1))).alias("bit"),
    )
    votes = bits.select(
        "doc_id",
        "bit",
        # shiftright()/shiftleft() Column API takes a literal shift
        # only; a column-valued shift needs the SQL expression form.
        F.expr("CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END").alias("vote"),
    )
    bit_sums = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


# ---------------------------------------------------------------------------
# Language-ID: fit n-gram profiles → broadcast model → score → argmax

_LANGS = ("de", "en", "es", "fr", "zh")  # fixture label set (TESTDATA.md)


def _lang_rate_cols(prefix: str) -> list[str]:
    return [f"{prefix}{lang}" for lang in _LANGS]


# Shared lang-ID CTE chain + argmax CASE — used verbatim by the
# classifier op and the confusion-matrix op so the two oracles can
# never drift.
_LANG_ID_CTES = f"""toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    labeled AS (
        SELECT d.lang, unnest(string_split(d.text, ' ')) AS token
        FROM documents d),
    counts AS (
        SELECT token, lang, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM labeled GROUP BY token, lang),
    totals AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS total
        FROM labeled GROUP BY lang),
    profile AS (
        SELECT token,
        {",".join(
            f"COALESCE(SUM(CASE WHEN c.lang = '{lang}' THEN "
            f"CAST(c.cnt AS DOUBLE) / t.total END), 0.0) AS r_{lang}"
            for lang in _LANGS
        )}
        FROM counts c JOIN totals t ON c.lang = t.lang
        GROUP BY token),
    scored AS (
        SELECT k.doc_id,
        {",".join(
            f"list_sum(list_transform(list_sort(list(struct_pack("
            f"tok := k.token, r := p.r_{lang}))), s -> s.r)) AS s_{lang}"
            for lang in _LANGS
        )}
        FROM toks k JOIN profile p ON k.token = p.token
        GROUP BY k.doc_id)"""

_LANG_PRED_CASE = f"""CASE
           {" ".join(
               "WHEN " + " AND ".join(
                   f"s_{lang} >= s_{other}"
                   for other in _LANGS if other != lang
               ) + f" THEN '{lang}'"
               for lang in _LANGS
           )}
           END"""


@query(
    "text_lang_id",
    oracle=f"""
    WITH {_LANG_ID_CTES}
    SELECT doc_id, {", ".join(f"s_{lang}" for lang in _LANGS)},
           {_LANG_PRED_CASE} AS predicted_lang
    FROM scored
    """,
    tier="P2",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPUTED language identification, n-gram-profile style: fit
    per-language token-frequency profiles from the labeled corpus, then
    score every document against each profile and argmax.

    (On this fixture all languages share one vocabulary, so predictions
    hover at chance — the operator's contract is the *computation*,
    verified exactly against the SQL twin; swap the tokenizer to
    character n-grams for a real corpus, identical plan.)

    Determinism: profile rates are cnt/total over exact BIGINTs —
    identical operands on both engines, bit-exact (exprs.py rule 2, no
    rounding).  Per-document scores SUM those doubles, which IS
    order-sensitive — so both engines fold the rates in sorted-token
    order (sort_array + aggregate here, list_sort + list_sum in the
    oracle), making the sum bit-reproducible.  Argmax ties break by
    the fixed _LANGS comparison order, identical in both dialects.

    100 TB: the profile is model-sized (vocab × n_langs) — fit is one
    partial/final agg, scoring is a BROADCAST join + per-doc fold; the
    only data-sized shuffle keys on doc_id.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    labeled = docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("token"))

    totals = labeled.groupBy("lang").agg(F.count(F.lit(1)).alias("total"))
    profile = (
        labeled.groupBy("token", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(totals, "lang")
        .groupBy("token")
        .agg(
            *[
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("lang") == lang,
                            F.col("cnt").cast("double") / F.col("total"),
                        )
                    ),
                    F.lit(0.0),
                ).alias(f"r_{lang}")
                for lang in _LANGS
            ]
        )
    )

    def _fold_rates(field: str):
        # Single-param lambdas only: a two-param lambda would be read
        # by transform() as the (element, index) signature.
        return F.aggregate(
            F.transform(F.col("rates"), lambda s: s.getField(field)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"s_{field.removeprefix('r_')}")

    scored = (
        toks.join(F.broadcast(profile), "token")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("token").alias("tok"),
                        *[F.col(f"r_{lang}").alias(f"r_{lang}") for lang in _LANGS],
                    )
                )
            ).alias("rates")
        )
        .select("doc_id", *[_fold_rates(f"r_{lang}") for lang in _LANGS])
    )
    pred_expr = None
    for lang in _LANGS:
        cond = None
        for other in _LANGS:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred_expr = (
            F.when(cond, F.lit(lang))
            if pred_expr is None
            else pred_expr.when(cond, F.lit(lang))
        )
    return scored.select(
        "doc_id",
        *[F.col(f"s_{lang}") for lang in _LANGS],
        pred_expr.alias("predicted_lang"),
    )


# GPT-2-style pre-tokenizer shape, ASCII simplification: a token is an
# optionally-space-prefixed letter run, digit run, or punctuation run,
# or a whitespace run.  Same RE2/Java-regex semantics in both engines.
_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS INT) AS n_bpe_tokens,
           CAST(length(text) AS DOUBLE)
             / len(regexp_extract_all(text, '{_BPE_PAT}')) AS bytes_per_token
    FROM documents
    """,
    tier="P2",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens
    next to a BPE-ish regex pre-tokenization (letter/digit/punct runs,
    optional leading space — the GPT-2 pre-tokenizer shape without the
    contraction table), plus bytes-per-token, the compression-ratio
    proxy quality filters threshold on.

    Map-only JVM regex — no shuffle at any scale; bytes/token divides
    identical exact ints on both engines (bit-exact, no rounding).
    """
    docs = load(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0))
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (F.length("text").cast("double") / n_bpe).alias("bytes_per_token"),
    )


_RH_B = 131  # polynomial base
_RH_M = 1_000_000_007  # modulus: acc*B + c < 1.4e11 << 2^63, overflow-safe
_RH_W = 8  # shingle width (chars) for the winnowing fingerprint


@query(
    "text_fingerprint_rolling",
    oracle=f"""
    WITH c AS (
        SELECT doc_id,
               list_transform(string_split_regex(text, ''),
                              ch -> CAST(ascii(ch) AS BIGINT)) AS codes
        FROM documents)
    SELECT doc_id,
           list_reduce(codes, (acc, x) -> (acc * {_RH_B} + x) % {_RH_M})
               AS full_fp,
           CASE WHEN len(codes) >= {_RH_W} THEN
               list_min(list_transform(range(1, len(codes) - {_RH_W} + 2),
                   i -> list_reduce(codes[i : i + {_RH_W} - 1],
                                    (acc, x) -> (acc * {_RH_B} + x) % {_RH_M})))
           ELSE list_reduce(codes, (acc, x) -> (acc * {_RH_B} + x) % {_RH_M})
           END AS winnow_fp
    FROM c
    """,
    tier="P2",
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-style polynomial rolling-hash fingerprints — the
    content-defined-chunking / winnowing primitive next to the SimHash
    fingerprint: ``full_fp`` hashes the whole document (cheap exact-dup
    key), ``winnow_fp`` is the minimum hash over all 8-char shingles
    (stable under appends outside the minimal window — the winnowing
    selection rule).

    EXACT integer arithmetic mod 1e9+7 on both engines, so unlike
    SimHash this fingerprint is fully SQL-hash-verified.  All JVM
    higher-order functions, map-only, no shuffle.  (Spark trap: the
    shingle count must be guarded — sequence(1, k) counts DOWN for
    k < 1, fabricating windows for short docs.)
    """
    docs = load(spark, sf_dir, "documents")
    codes = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c).cast("bigint"))

    def _fold(arr):
        return F.aggregate(
            arr,
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * _RH_B + x) % _RH_M,
        )

    with_codes = docs.select("doc_id", codes.alias("codes"))
    n = F.size(F.col("codes"))
    shingles = F.transform(
        F.sequence(F.lit(1), n - _RH_W + 1),
        lambda i: _fold(F.slice(F.col("codes"), i, _RH_W)),
    )
    full_fp = _fold(F.col("codes"))
    return with_codes.select(
        "doc_id",
        full_fp.alias("full_fp"),
        F.when(n >= _RH_W, F.array_min(shingles))
        .otherwise(full_fp)
        .alias("winnow_fp"),
    )


_CHUNK_LEN = 200
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks

_CHUNK_ORACLE = f"""
    WITH c AS (
        SELECT doc_id, text,
               unnest(range(0, (length(text) - 1) // {_CHUNK_STRIDE} + 1)) AS chunk_id
        FROM documents
        WHERE length(text) > 0)
    SELECT doc_id,
           CAST(chunk_id AS INT) AS chunk_id,
           substr(text, CAST(chunk_id * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_LEN})
               AS chunk_text,
           CAST(length(substr(text, CAST(chunk_id * {_CHUNK_STRIDE} + 1 AS INT),
                              {_CHUNK_LEN})) AS INT) AS n_chunk_chars
    FROM c
    """


@query("text_chunk_overlap", oracle=_CHUNK_ORACLE, tier="P1")
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks
    (len 200, stride 150) — the context-window packing step of a
    training/RAG pipeline.

    The chunk index is generated with ``sequence`` + ``explode`` and the
    slice with ``substr`` over (start, len) columns — a pure row-local
    generator, so the plan is a map-only scan whose output is ~
    (doc_len / stride) rows per doc with NO shuffle and no Python.
    Chunking fan-out happens after pushdown/pruning, so at 100 TB the
    scan still prunes to (doc_id, text).
    """
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chunks = F.floor((F.length("text") - 1) / _CHUNK_STRIDE) + 1
    chunks = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("cid"),
    )
    start = (F.col("cid") * _CHUNK_STRIDE + 1).cast("int")
    chunk_text = F.col("text").substr(start, F.lit(_CHUNK_LEN))
    return chunks.select(
        "doc_id",
        F.col("cid").cast("int").alias("chunk_id"),
        chunk_text.alias("chunk_text"),
        F.length(chunk_text).alias("n_chunk_chars"),
    )


@query(
    "text_pii_scrub",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_masked,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_masked
    FROM events
    """,
    tier="P1",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: mask every digit run in the free-text
    payload (events.props) with a placeholder and count the masked
    spans — the redaction/normalization step of a corpus-cleaning
    pipeline, shaped exactly like email/phone redaction with a richer
    pattern list.

    Pure row-local regexp_replace/regexp_count — map-only, no shuffle,
    stays in whole-stage codegen at any scale.  The pattern is kept to
    syntax RE2 (DuckDB) and java.util.regex (Spark) interpret
    identically.
    """
    ev = load(spark, sf_dir, "events")
    pat = "[0-9]+"
    return ev.select(
        "event_id",
        F.regexp_replace(F.col("props"), pat, "<NUM>").alias("props_masked"),
        F.regexp_count(F.col("props"), F.lit(pat)).cast("int").alias("n_masked"),
    )


@query(
    "index_inverted_postings",
    oracle="""
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
          FROM documents)
    GROUP BY token
    """,
    tier="P1",
)
def index_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token -> (document frequency, sorted
    posting list) — the retrieval-side artifact of a corpus pipeline
    (BM25 / keyword search / decontamination lookups all start here).

    Plan: explode -> distinct (one (doc, token) posting per pair) ->
    partial+final hash agg keyed on token.  The shuffle carries one row
    per posting, never whole documents.  The posting list is emitted in
    canonical sorted comma-joined string form: at 100 TB postings stay
    ARRAY<BIGINT> (the string render is the oracle-canonical surface;
    complex columns are unhashable in the cross-engine compare) and
    hot tokens would be range-split into posting segments — here df is
    bounded by doc count per token, and array_sort pins element order.
    """
    docs = load(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).distinct()
    return postings.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.array_join(
            F.array_sort(F.collect_set("doc_id")).cast("array<string>"), ","
        ).alias("postings"),
    )


_BOILER_MIN_DOCS = 5


@query(
    "text_boilerplate_spans",
    oracle=f"""
    WITH tri AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
    SELECT shingle,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_df,
           CAST(COUNT(*) AS BIGINT) AS occurrences
    FROM tri
    GROUP BY shingle
    HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
    """,
    tier="P2",
)
def text_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span mining: trigram shingles that occur
    in >= 5 (_BOILER_MIN_DOCS) distinct documents — the boilerplate
    detector (headers, footers, license blocks, nav text) that C4-style
    cleaning removes before training.

    Distinct from `corpus_decontam_ngram` (train-vs-eval overlap) and
    `dedup_near_ngram` (pairwise Jaccard): this is a corpus-global
    shingle doc-frequency profile.  Shingling is JVM-side
    (transform/sequence over the split array), and the count-distinct
    is a two-level agg keyed on (shingle, doc_id) partials — no doc_id
    set is ever materialized per shingle, so a shingle appearing in
    millions of documents costs one counter, not a collected list.
    """
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    # Guard size(t) < 3 explicitly: sequence(1, size-2) DESCENDS for
    # short arrays (sequence(1,0) = [1,0]) and element_at then indexes
    # past the array — an ANSI-mode job abort on any 1-2-token
    # document.  The empty-array branch matches the oracle's range(),
    # which is simply empty below 3 tokens.
    tri = F.when(
        F.size(F.col("t")) >= 3,
        F.expr(
            "transform(sequence(1, size(t) - 2), "
            "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1), "
            "element_at(t, i + 2)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    shingles = docs.withColumn("t", t).select(
        "doc_id", F.explode(tri).alias("shingle")
    )
    return (
        shingles.groupBy("shingle")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("doc_df"),
            F.count(F.lit(1)).cast("bigint").alias("occurrences"),
        )
        .filter(F.col("doc_df") >= _BOILER_MIN_DOCS)
    )


@query(
    "text_entropy",
    oracle="""
    WITH tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           round((ln(CAST(SUM(tf) AS DOUBLE))
                  - SUM(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE)))
                    / CAST(SUM(tf) AS DOUBLE)) / ln(2.0), 6) AS entropy_bits
    FROM tf
    GROUP BY doc_id
    """,
    tier="P2",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document (bits) — the
    randomness/quality signal that catches keyboard-mash and
    single-token-spam pages that length and stopword ratios miss.

    H = log2(n) - (1/n) * sum(tf * log2(tf)), computed from exact
    integer term frequencies via the identity that avoids per-token
    probabilities.  Two-level agg: (doc, token) partial counts, then a
    per-doc combine — both shuffles carry counters only.  The ln() and
    the float sum take different paths in the two engines (libm,
    summation order), so the final value is rounded to 6 places per
    the determinism contract; the integer columns stay exact.
    """
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    n = F.sum("tf").cast("bigint")
    s = F.sum(F.col("tf").cast("double") * F.log(F.col("tf").cast("double")))
    return tf.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round(
            (F.log(n.cast("double")) - s / n.cast("double")) / F.log(F.lit(2.0)),
            6,
        ).alias("entropy_bits"),
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    corpus AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM corpus),
    tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           round(-SUM(CAST(tf.tf AS DOUBLE)
                      * ln(CAST(c.cnt AS DOUBLE) / CAST(t.n_total AS DOUBLE)))
                 / CAST(SUM(tf.tf) AS DOUBLE), 6) AS cross_entropy,
           round(exp(-SUM(CAST(tf.tf AS DOUBLE)
                          * ln(CAST(c.cnt AS DOUBLE) / CAST(t.n_total AS DOUBLE)))
                     / CAST(SUM(tf.tf) AS DOUBLE)), 6) AS perplexity
    FROM tf JOIN corpus c ON tf.token = c.token CROSS JOIN total t
    GROUP BY tf.doc_id
    """,
    tier="P2",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per-document cross-entropy (and
    perplexity) against the corpus unigram distribution — the
    CCNet-style LM-perplexity quality filter (documents whose token
    distribution is improbable under the corpus model are boilerplate,
    spam, or wrong-language).

    Two aggregations (corpus counts, per-doc tf), one join on token,
    and the corpus total rides as an in-plan one-row cross join — no
    driver-side action.  The corpus-count side grows with vocabulary,
    so it carries NO broadcast hint (same policy as tf-idf's df side).
    The probability ratio is exact-int division (bit-identical), but
    ln/exp take different libm paths and the weighted sum is
    order-dependent, so the two output values are rounded at 6 per the
    determinism contract; counts stay exact.
    """
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    corpus = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = corpus.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    ln_p = F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double"))
    scored = tf.join(corpus, "token").crossJoin(F.broadcast(total))
    n = F.sum("tf").cast("bigint")
    ce = -F.sum(F.col("tf").cast("double") * ln_p) / n.cast("double")
    return scored.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 6).alias("perplexity"),
    )


_KN_D = 0.75  # Kneser-Ney absolute discount (the standard value)


@query(
    "text_bigram_kn_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
        SELECT doc_id,
               split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i + 1])) AS b
              FROM t)
    ),
    c12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM bg GROUP BY w1, w2
    ),
    ctx AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n_after
        FROM c12 GROUP BY w1
    ),
    cont AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_before
        FROM c12 GROUP BY w2
    ),
    ttl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM c12),
    model AS (
        SELECT c12.w1, c12.w2,
               (CAST(c12.c12 AS DOUBLE) - {_KN_D}) / ctx.c1
               + ({_KN_D} * ctx.n_after / ctx.c1)
                 * (CAST(cont.n_before AS DOUBLE) / ttl.n_types) AS p
        FROM c12
        JOIN ctx ON c12.w1 = ctx.w1
        JOIN cont ON c12.w2 = cont.w2
        CROSS JOIN ttl
    ),
    tf AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
        FROM bg GROUP BY doc_id, w1, w2
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
           round(-SUM(CAST(tf.tf AS DOUBLE) * ln(m.p))
                 / CAST(SUM(tf.tf) AS DOUBLE), 6) AS cross_entropy,
           round(exp(-SUM(CAST(tf.tf AS DOUBLE) * ln(m.p))
                     / CAST(SUM(tf.tf) AS DOUBLE)), 6) AS perplexity
    FROM tf JOIN model m ON tf.w1 = m.w1 AND tf.w2 = m.w2
    GROUP BY tf.doc_id
    """,
    tier="P2",
)
def text_bigram_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1998): per-document cross-entropy and perplexity
    under a KN-smoothed bigram model trained on the corpus itself —
    the step up from ``text_unigram_logprob`` that a CCNet-style
    quality pipeline takes when unigram perplexity stops separating
    fluent text from well-distributed token salad (a bag of frequent
    words scores well under a unigram model; KN demands the frequent
    TRANSITIONS too).

    Model, all from two bigram aggregates: P(w2|w1) =
    max(c(w1,w2) − D, 0)/c(w1·) + λ(w1)·P_cont(w2) with D = 0.75,
    λ(w1) = D·N1+(w1·)/c(w1·), and the Kneser-Ney continuation
    probability P_cont(w2) = N1+(·w2)/|bigram types| (how many
    contexts a word FOLLOWS, not how often it occurs).  Because the
    model is trained on the scored corpus, every scored bigram has
    c ≥ 1 > D, so the max() never clips and no out-of-vocabulary
    backoff path is needed — self-scoring is the quality-filter
    deployment (score each doc against the corpus it belongs to).

    Plan shape: one bigram explode (map-only transform over the token
    array, the BPE pair pattern), corpus model = one groupBy(w1, w2)
    then two vocabulary-sized groupBys of THAT (context totals + Kneser
    continuation counts — each row of c12 is a distinct bigram, so
    count(*) IS N1+), one 1-row type-total broadcast, and per-doc tf
    joined to the model on the bigram key — every shuffle is linear in
    corpus bigrams or bounded by Heaps-law bigram-type counts; no
    broadcast of anything vocabulary-sized.  The probability arithmetic
    is identical-operand IEEE on exact counts, but ln/exp take
    different libm paths and the per-doc weighted sum is
    order-dependent — outputs rounded @6, counts exact (the unigram
    twin's contract).
    """
    docs = load(spark, sf_dir, "documents")
    # size >= 2 guard first: sequence(1, 0) DESCENDS in Spark (the BPE
    # trap, text.py:1150) and element_at(_, 0) is an error, so a
    # 1-token doc must never reach the transform.
    bg = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = c12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).alias("n_after"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n_before"))
    ttl = c12.agg(F.count(F.lit(1)).alias("n_types"))
    p = (F.col("c12").cast("double") - _KN_D) / F.col("c1") + (
        F.lit(_KN_D) * F.col("n_after") / F.col("c1")
    ) * (F.col("n_before").cast("double") / F.col("n_types"))
    model = (
        c12.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(ttl))
        .select("w1", "w2", p.alias("p"))
    )
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.join(model, ["w1", "w2"])
    n = F.sum("tf").cast("bigint")
    ce = -F.sum(F.col("tf").cast("double") * F.log(F.col("p"))) / n.cast(
        "double"
    )
    return scored.groupBy("doc_id").agg(
        n.alias("n_bigrams"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 6).alias("perplexity"),
    )


_HASH_DIM = 1024  # feature-vector width for the hashing trick


@query(
    "text_hashing_trick",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT doc_id,
           CAST({o_poly_hash('token')} % {_HASH_DIM} AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks
    GROUP BY doc_id, {o_poly_hash('token')} % {_HASH_DIM}
    """,
    tier="P2",
)
def text_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick / HashingTF): map each token
    to one of 1024 (_HASH_DIM) buckets by content hash and count per
    (doc, bucket) — the fixed-width sparse featurization that needs NO
    vocabulary pass, which is exactly why it is the 100 TB choice over
    CountVectorizer (whose vocabulary is a corpus-sized dictionary to
    build, broadcast, and version).

    The bucket hash is the cross-engine-exact polynomial hash, so
    unlike MLlib's HashingTF (Murmur3, JVM-only) the full sparse
    matrix is value-hash-verified against DuckDB.  One explode + one
    partial+final hash agg keyed on (doc_id, bucket) — map-side
    combine collapses repeated tokens before the shuffle.  Emitted
    long-form (doc, bucket, tf): the layout that joins/aggregates
    downstream without array repacking.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    bucket = (poly_hash("token") % _HASH_DIM).cast("int")
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


_BPE_TOPK = 20

_BPE_ORACLE = f"""
WITH words AS (
    SELECT lang, unnest(string_split(text, ' ')) AS w
    FROM documents
), pairs AS (
    SELECT lang,
           unnest([substr(w, i, 2) FOR i IN generate_series(1, length(w) - 1)])
               AS pair
    FROM words
    WHERE length(w) >= 2
), counts AS (
    SELECT lang, pair, CAST(COUNT(*) AS BIGINT) AS freq
    FROM pairs
    GROUP BY lang, pair
)
SELECT lang, pair, freq, rank
FROM (
    SELECT lang, pair, freq,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY freq DESC, pair
           ) AS INT) AS rank
    FROM counts
)
WHERE rank <= {_BPE_TOPK}
"""


@query("text_bpe_pair_counts", oracle=_BPE_ORACLE, tier="P2")
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, inner loop: count adjacent character
    pairs inside whitespace words and rank the top merge candidates
    per language — the statistic byte-pair encoding greedily merges on
    each round (Sennrich et al. 2016).  A tokenizer trained over a
    100 TB corpus runs exactly this query per merge step, so it has to
    be a first-class distributed aggregate, not a driver-side pass.

    Plan shape: split + double explode (words, then the in-word pair
    list via ``transform(sequence(...))`` — all JVM-side, no Python),
    then one partial+final count keyed on (lang, pair).  The map-side
    combine collapses the explode fan-out before the shuffle, and the
    shuffled key space is bounded by alphabet² per language — at
    100 TB the shuffle carries per-partition (lang, pair) partials,
    never per-occurrence rows.  The final top-k window partitions by
    lang over that same bounded pair space (thousands of rows per
    lang, not corpus-sized), so the rank stage is a no-spill single
    stage regardless of corpus size.  Ties are impossible below the
    cutoff boundary by construction: (freq DESC, pair ASC) is a total
    order because pair is unique within its group.
    """
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    counts = pairs.groupBy("lang", "pair").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("pair"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BPE_TOPK)
        .select("lang", "pair", "freq", "rank")
    )


_BPE_MERGE_STEPS = 8


def _bpe_train_ctes(n: int) -> str:
    """Chained-CTE DuckDB replay of ``n`` greedy BPE merge rounds —
    the shared WITH-clause body for the trainer and the encoder
    oracles.

    Each step s re-derives pair counts from the step-(s-1) vocabulary,
    picks the per-lang argmax under the same (freq DESC, lhs, rhs)
    total order the Spark plan uses, and applies the merge via the
    identical cell-string replace — so the two engines walk the same
    greedy path symbol for symbol.
    """
    parts = [
        """
WITH v0 AS (
    SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS wfreq,
           regexp_replace(w, '(.)', ' \\1 ', 'g') AS repr
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE length(w) >= 2
    GROUP BY lang, w
)"""
    ]
    for s in range(1, n + 1):
        parts.append(
            f""", c{s} AS (
    SELECT lang, syms[i] AS lhs, syms[i + 1] AS rhs,
           CAST(SUM(wfreq) AS BIGINT) AS freq
    FROM (SELECT lang, wfreq, syms,
                 unnest(generate_series(1, len(syms) - 1)) AS i
          FROM (SELECT lang, wfreq,
                       string_split(trim(repr), '  ') AS syms
                FROM v{s - 1}))
    GROUP BY 1, 2, 3
), b{s} AS (
    SELECT lang, lhs, rhs, freq FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY freq DESC, lhs, rhs) AS rn
        FROM c{s}
    ) WHERE rn = 1
), v{s} AS (
    SELECT v.lang, v.w, v.wfreq,
           CASE WHEN b.lhs IS NOT NULL THEN
               replace(v.repr, ' ' || b.lhs || '  ' || b.rhs || ' ',
                               ' ' || b.lhs || b.rhs || ' ')
           ELSE v.repr END AS repr
    FROM v{s - 1} v LEFT JOIN b{s} b ON v.lang = b.lang
)"""
        )
    return "".join(parts)


def _bpe_merge_oracle(n: int) -> str:
    finals = [
        f"SELECT lang, CAST({s} AS INT) AS step, lhs, rhs,"
        f" lhs || rhs AS merged, freq FROM b{s}"
        for s in range(1, n + 1)
    ]
    return _bpe_train_ctes(n) + "\n" + "\nUNION ALL\n".join(finals)


@query(
    "text_bpe_merge_steps",
    oracle=_bpe_merge_oracle(_BPE_MERGE_STEPS),
    tier="P2",
)
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING — the full greedy merge loop (Sennrich
    et al. 2016), 8 rounds per language, returning the learned merge
    table (lang, step, lhs, rhs, merged, freq).  This turns the
    round-6 single-step statistic (``text_bpe_pair_counts``) into the
    actual trainer a 100 TB corpus needs: each round counts adjacent
    symbol pairs over the word-frequency vocabulary, merges the most
    frequent pair everywhere it occurs, and repeats on the re-segmented
    vocabulary.

    Scale design: the corpus is touched ONCE — the initial
    (lang, word) → frequency aggregate — and every merge round then
    runs over that vocabulary table, which is orders of magnitude
    smaller than the corpus (Heaps' law) and localCheckpoint-ed per
    round so round s never recomputes rounds 1..s-1 (the PageRank
    pattern, graph.py).  The per-round state handed to the next round
    is ONE row per language — broadcast by construction, the same
    bounded-state argument as the DSIR ratio table (corpus.py).  Round
    count is a training hyperparameter, not a function of corpus size
    — but it IS this architecture's scale axis: one shuffle round per
    merge is for statistic-scale merge counts (≤ ~100), not a 30k-merge
    production vocabulary.  The rounds envelope and the production
    split (driver-side merge loop over the Heaps-law vocabulary +
    distributed encode via broadcast merge table) are documented in
    ``_bpe_train``'s docstring and docs/SCALE.md.

    Greedy-merge mechanics: each word's segmentation is a CELL STRING
    — every symbol wrapped as ``' sym '`` and concatenated, so
    adjacent symbols are separated by exactly two spaces.  Merging
    pair (L, R) is then the literal replace of ``' L  R '`` with
    ``' LR '``: each match consumes both full cells, so matches can
    never straddle a symbol boundary (a match's second character is
    L's first, which is non-space, while the character after any
    cell-trailing space is always a space), and left-to-right
    non-overlapping replace — the semantics of both engines'
    ``replace`` — is exactly BPE's greedy scan ('aaaa' under (a,a)
    becomes 'aa aa', not 'aa a a').  Ties in the argmax are broken by
    (lhs, rhs), a total order since pairs are unique per group.

    Why not collect the argmax and splice literals into the next
    round's plan?  Keeping the winner as a 1-row-per-lang broadcast
    join leaves the whole trainer declarative — Catalyst sees every
    round, and the driver never holds corpus-derived strings.
    """
    _, bests = _bpe_train(spark, sf_dir, need_final=False)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out


def _bpe_train(
    spark: SparkSession, sf_dir: str, need_final: bool = True
) -> tuple[DataFrame | None, list[DataFrame]]:
    """Run the greedy merge loop; return (final segmented vocabulary,
    per-step merge rows) — shared by the trainer (merge table) and the
    encoder (symbol stats) queries.

    ``need_final=False`` (the trainer's path, which consumes only the
    per-step merge rows) skips the LAST round's vocabulary-wide
    replace + localCheckpoint — the final segmentation is only an
    input to the NEXT round's pair counts, and there is no next round.
    Rounds 1..n-1 still materialize unconditionally: their ``cur`` is
    what round s+1's counts read.  Returns ``(None, bests)`` in that
    mode.

    Rounds envelope (the 100 TB honesty note): this architecture runs
    ONE Spark shuffle round + localCheckpoint PER MERGE, so it is for
    statistic-scale merge counts (≤ ~100 rounds — merge-table audits,
    per-language vocabulary probes, curriculum diagnostics), not for
    training a production 30k-merge vocabulary, which would mean 30k
    sequential Spark rounds of pure scheduling latency.  The
    production split: the corpus-wide (lang, word) → frequency
    aggregate stays distributed (it IS the one corpus pass here), the
    vocabulary — MBs after Heaps' law — is hash-sampled or collected
    to the driver for the tight merge loop, and the learned merge
    table comes back as a broadcast for distributed ENCODE (the
    encoder half already exists: bpe_encode_stats applies merges via
    exactly such a broadcast join).  Same envelope pattern as
    dedup_near_exact's corpus note (dedup.py).
    """
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("wfreq"))
        .withColumn("repr", F.regexp_replace(F.col("w"), "(.)", " $1 "))
    )
    cur = vocab.localCheckpoint()
    bests: list[DataFrame] = []
    w_best = Window.partitionBy("lang").orderBy(
        F.desc("freq"), F.asc("lhs"), F.asc("rhs")
    )
    for s in range(1, _BPE_MERGE_STEPS + 1):
        pairs = (
            cur.withColumn("syms", F.split(F.trim(F.col("repr")), "  "))
            .filter(F.size("syms") >= 2)  # sequence(1,0) would DESCEND
            .select(
                "lang",
                "wfreq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS lhs, "
                        "element_at(syms, i + 1) AS rhs))"
                    )
                ).alias("pr"),
            )
            .select("lang", F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"), "wfreq")
        )
        counts = pairs.groupBy("lang", "lhs", "rhs").agg(
            F.sum("wfreq").alias("freq")
        )
        best = (
            counts.withColumn("rn", F.row_number().over(w_best))
            .filter(F.col("rn") == 1)
            .select("lang", "lhs", "rhs", "freq")
        )
        bests.append(
            best.select(
                "lang",
                F.lit(s).cast("int").alias("step"),
                "lhs",
                "rhs",
                F.concat("lhs", "rhs").alias("merged"),
                "freq",
            )
        )
        if s == _BPE_MERGE_STEPS and not need_final:
            return None, bests
        # One row per language — bounded by language cardinality, the
        # same broadcast argument as corpus.py's mixture-weight table.
        merge_tbl = F.broadcast(
            best.select(
                "lang",
                F.col("lhs").alias("m_lhs"),
                F.col("rhs").alias("m_rhs"),
            )
        )
        cur = (
            cur.join(merge_tbl, "lang", "left")
            .withColumn(
                "repr",
                F.when(
                    F.col("m_lhs").isNotNull(),
                    F.replace(
                        F.col("repr"),
                        F.concat(
                            F.lit(" "),
                            F.col("m_lhs"),
                            F.lit("  "),
                            F.col("m_rhs"),
                            F.lit(" "),
                        ),
                        F.concat(
                            F.lit(" "),
                            F.col("m_lhs"),
                            F.col("m_rhs"),
                            F.lit(" "),
                        ),
                    ),
                ).otherwise(F.col("repr")),
            )
            .drop("m_lhs", "m_rhs")
            .localCheckpoint()
        )
    return cur, bests


_BPE_ENCODE_TOPK = 30


@query(
    "text_bpe_encode_stats",
    oracle=_bpe_train_ctes(_BPE_MERGE_STEPS)
    + f"""
SELECT lang, sym, freq, rank FROM (
    SELECT lang, sym, freq,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY freq DESC, sym) AS INT) AS rank
    FROM (SELECT lang, syms[i] AS sym, CAST(SUM(wfreq) AS BIGINT) AS freq
          FROM (SELECT lang, wfreq, syms,
                       unnest(generate_series(1, len(syms))) AS i
                FROM (SELECT lang, wfreq,
                             string_split(trim(repr), '  ') AS syms
                      FROM v{_BPE_MERGE_STEPS}))
          GROUP BY 1, 2)
)
WHERE rank <= {_BPE_ENCODE_TOPK}
""",
    tier="P2",
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — apply the trainer's learned merges back to the
    corpus and rank the resulting symbol distribution: top-30 symbols
    per language with their corpus frequencies (word-frequency
    weighted).  Train + encode is the full tokenizer lifecycle: this
    is the query that tells you what the vocabulary you just learned
    actually does to the corpus (compression, which merges dominate,
    how much stays at the character floor).

    Same scale shape as the trainer (one corpus pass, then
    vocabulary-sized work): the final segmentation already exists as
    the trainer's step-8 vocabulary — encoding is ONE explode of the
    segmented reprs weighted by word frequency, a bounded
    (lang, symbol) aggregate, and a per-lang top-k window over that
    bounded key space (the text_bpe_pair_counts rank argument).
    Single-character words never merge and pass through at the
    character floor; like the trainer, words shorter than 2 chars are
    out of the vocabulary domain.  The oracle replays the identical
    8-round greedy path (shared CTE chain), then the identical
    explode + rank.
    """
    cur, _ = _bpe_train(spark, sf_dir)
    syms = (
        cur.withColumn("syms", F.split(F.trim(F.col("repr")), "  "))
        .select("lang", "wfreq", F.explode("syms").alias("sym"))
        .groupBy("lang", "sym")
        .agg(F.sum("wfreq").alias("freq"))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("sym"))
    return (
        syms.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rank") <= _BPE_ENCODE_TOPK)
        .select("lang", "sym", "freq", "rank")
    )


@query(
    "text_bpe_fertility",
    oracle=_bpe_train_ctes(_BPE_MERGE_STEPS)
    + f"""
SELECT lang,
       CAST(SUM(wfreq) AS BIGINT) AS words,
       CAST(SUM(wfreq * length(w)) AS BIGINT) AS chars,
       CAST(SUM(wfreq * len(string_split(trim(repr), '  '))) AS BIGINT)
           AS symbols,
       round(CAST(SUM(wfreq * len(string_split(trim(repr), '  '))) AS DOUBLE)
             / SUM(wfreq), 6) AS fertility,
       round(CAST(SUM(wfreq * length(w)) AS DOUBLE)
             / SUM(wfreq * len(string_split(trim(repr), '  '))), 6)
           AS chars_per_symbol
FROM v{_BPE_MERGE_STEPS}
GROUP BY lang
""",
    tier="P2",
)
def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary READOUT — per-language fertility (symbols per
    word) and compression (chars per symbol) after the trainer's 8
    merges: the numbers a tokenizer team actually steers on.  Fertility
    starts at chars-per-word (character floor, zero merges) and falls
    toward 1.0 as merges absorb frequent words whole; a 100 TB token
    budget is words × fertility, so this single bounded-output query
    converts the trainer into a budget planner (cf. corpus_token_budget,
    which counts whitespace words — this is the learned-vocab version).

    Same scale shape as the trainer it reuses (_bpe_train): one corpus
    pass, vocabulary-sized rounds, then ONE aggregate over the final
    segmented vocabulary — output is one row per language.  The two
    ratios are float division of exact int64 sums computed identically
    in both engines from the same greedy path, rounded @6 (the
    summation-order-divergence boundary does not arise: numerators and
    denominators are exact integers).
    """
    cur, _ = _bpe_train(spark, sf_dir)
    segmented = cur.withColumn(
        "n_syms", F.size(F.split(F.trim(F.col("repr")), "  "))
    )
    return segmented.groupBy("lang").agg(
        F.sum("wfreq").alias("words"),
        F.sum(F.col("wfreq") * F.length("w")).alias("chars"),
        F.sum(F.col("wfreq") * F.col("n_syms")).alias("symbols"),
        F.round(
            F.sum(F.col("wfreq") * F.col("n_syms")).cast("double")
            / F.sum("wfreq"),
            6,
        ).alias("fertility"),
        F.round(
            F.sum(F.col("wfreq") * F.length("w")).cast("double")
            / F.sum(F.col("wfreq") * F.col("n_syms")),
            6,
        ).alias("chars_per_symbol"),
    )


@query(
    "text_bpe_encode_docs",
    oracle=_bpe_train_ctes(_BPE_MERGE_STEPS)
    + f"""
, seg AS (
    SELECT lang, w,
           CAST(len(string_split(trim(repr), '  ')) AS BIGINT) AS n_syms
    FROM v{_BPE_MERGE_STEPS}
),
tok AS (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
    FROM documents
),
tfw AS (
    SELECT doc_id, lang, w, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok GROUP BY doc_id, lang, w
),
enc AS (
    SELECT t.doc_id, t.lang, t.tf, length(t.w) AS wlen,
           COALESCE(s.n_syms, 1) AS n_syms
    FROM tfw t LEFT JOIN seg s ON t.lang = s.lang AND t.w = s.w
)
SELECT doc_id, lang,
       CAST(SUM(tf) AS BIGINT) AS n_words,
       CAST(SUM(tf * wlen) AS BIGINT) AS n_chars,
       CAST(SUM(tf * n_syms) AS BIGINT) AS n_symbols,
       CAST(SUM(tf * n_syms) AS DOUBLE) / SUM(tf) AS fertility
FROM enc
GROUP BY doc_id, lang
""",
    tier="P2",
)
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE over DOCUMENTS — the production half of the tokenizer
    lifecycle the trainer's envelope note promises (round-8 verdict
    task #5): apply the learned merge table to every document and emit
    the per-document token accounting (words, chars, BPE symbols,
    fertility) a packing/budget pipeline consumes downstream.

    The merge table is applied WITHOUT re-walking merges per
    occurrence: the trainer's final segmented vocabulary (lang, word →
    symbol count) IS the compiled form of the 8 learned merges, so
    encode is (1) one corpus pass to per-(doc, word) term frequencies
    — map-side combine collapses repeats before the shuffle; (2) an
    equi-join of those DISTINCT (doc, word) rows against the
    vocabulary-sized segmentation table (the CLAUDE.md rule: score the
    distinct vocabulary off a codegen aggregate, never lambda the
    occurrence stream — the segmentation splitting runs once per VOCAB
    row inside the trainer, and this op touches only its row count);
    AQE broadcasts the vocab side while it fits and shuffles on
    (lang, w) past that — no hint planted because vocabulary grows
    with the corpus (Heaps); (3) a per-doc aggregate of exact int64
    sums.  Words shorter than 2 chars are outside the trainer's
    vocabulary domain and encode at the character floor (1 symbol —
    the COALESCE arm).  fertility = n_symbols / n_words is an
    identical-operand division of exact ints, UNROUNDED per the
    exprs.py boundary rule.

    At 100 TB: trainer vocabulary is MBs (Heaps' law), so the encode
    pass is one corpus-linear aggregate + one broadcast-class join +
    one doc-keyed aggregate — the same shape as text_tokenize_tf with
    a vocabulary lookup attached.  The oracle replays the identical
    8-round greedy path (shared CTE chain) then the identical
    tf → left-join → rollup.

    [MEASURED, round 9] Corpus-linear three decades out: µs/row
    86.1 (10×) → 16.5 (100×) → 16.79 (1000× — 83.93 s for 5M docs),
    docs/SCALE.md.
    """
    docs = load(spark, sf_dir, "documents")
    cur, _ = _bpe_train(spark, sf_dir)
    seg = cur.select(
        "lang",
        "w",
        F.size(F.split(F.trim(F.col("repr")), "  "))
        .cast("bigint")
        .alias("n_syms"),
    )
    tfw = (
        docs.select(
            "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    enc = tfw.join(seg, ["lang", "w"], "left").select(
        "doc_id",
        "lang",
        "tf",
        F.length("w").alias("wlen"),
        F.coalesce("n_syms", F.lit(1)).alias("n_syms"),
    )
    n_words = F.sum("tf").cast("bigint")
    n_syms = F.sum(F.col("tf") * F.col("n_syms")).cast("bigint")
    return enc.groupBy("doc_id", "lang").agg(
        n_words.alias("n_words"),
        F.sum(F.col("tf") * F.col("wlen")).cast("bigint").alias("n_chars"),
        n_syms.alias("n_symbols"),
        (n_syms.cast("double") / n_words.cast("double")).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (Robertson & Spärck Jones; the Lucene/Okapi variant)

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 5  # top-k documents returned per query
# Fixed benchmark query set: term mixes chosen to exercise both the
# saturated high-df vocabulary and the one rare term ('dup', df ≈ 5%
# of docs) so the IDF term actually separates.
_BM25_QUERIES = (
    ("q_stream", ("spark", "stream", "batch")),
    ("q_dup", ("hash", "join", "dup")),
    ("q_sortmerge", ("sort", "merge")),
    ("q_scan", ("window", "scan", "query", "filter")),
)
_BM25_Q_SQL = ", ".join(
    f"('{qid}', '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH q(query_id, token) AS (VALUES {_BM25_Q_SQL}),
    qtok AS (SELECT DISTINCT token FROM q),
    d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(t)) AS DOUBLE) / COUNT(*) AS avgdl
        FROM d
    ),
    hits AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf,
               CAST(MAX(dl) AS INT) AS dl
        FROM (SELECT d.doc_id, len(d.t) AS dl, u.token
              FROM d, unnest(d.t) AS u(token)
              WHERE u.token IN (SELECT token FROM qtok))
        GROUP BY doc_id, token
    ),
    dfs AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
            FROM hits GROUP BY token),
    scored AS (
        SELECT q.query_id, h.doc_id,
               SUM(ln(1.0 + (s.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
                   * (h.tf * ({_BM25_K1} + 1.0))
                   / (h.tf + {_BM25_K1}
                      * (1.0 - {_BM25_B} + {_BM25_B} * h.dl / s.avgdl)))
                   AS raw,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM hits h
        JOIN q ON h.token = q.token
        JOIN dfs ON h.token = dfs.token
        CROSS JOIN stats s
        GROUP BY q.query_id, h.doc_id
    )
    SELECT query_id, doc_id, n_terms_hit, score
    FROM (SELECT query_id, doc_id, n_terms_hit, round(raw, 6) AS score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY round(raw, 6) DESC, doc_id)
                     AS rn
          FROM scored)
    WHERE rn <= {_BM25_K}
    """,
    tier="P2",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Okapi, the non-negative Lucene
    IDF variant): score every document against a fixed query set and
    return the 5 best per query — the ranked-retrieval half of the
    text stack (``index_inverted_postings`` builds the index shape;
    this is the scorer a RAG ingest or eval harness runs over it).

    score(D,Q) = sum over query terms t of ln(1 + (N−df+0.5)/(df+0.5))
                 · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
    with k1=1.2, b=0.75.

    100 TB plan shape — the key move is that the QUERY SET is the
    selective side: tokens are semi-joined to the (broadcast, literal)
    query vocabulary BEFORE any shuffle, so the exploded stream that
    reaches the (doc, token) aggregate carries only query-term hits
    (~8/31 of tokens here; a few dozen terms vs a web-scale vocabulary
    in production).  Document length rides the explode as a carried
    column (one corpus pass, no second scan or doc_id re-join), corpus
    stats (N, avgdl) are a 1-row broadcast, per-term df is a
    query-vocabulary-sized broadcast derived from the hits aggregate
    itself, and the final top-k is a window over per-query partitions
    (k rows per query out).  Scoring arithmetic: ln is libm-divergent
    and the per-doc term sum is order-dependent, so the score is
    rounded @6 and the window orders by the ROUNDED score with doc_id
    tiebreak — both engines rank the identical key.  tf/dl/df stay
    exact ints.
    """
    docs = load(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id string, token string",
    )
    qtok = qterms.select("token").distinct()
    d = docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum(F.size("t")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    hits = (
        d.select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("token"))
        .join(F.broadcast(qtok), "token")
        .groupBy("doc_id", "token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.max("dl").cast("int").alias("dl"),
        )
    )
    dfs = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1
        * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        hits.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dfs), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum(idf * tf_part), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _BM25_K)
        .select("query_id", "doc_id", "n_terms_hit", "score")
    )


_PMI_MIN_COUNT = 5  # drop noise pairs below this corpus count
_PMI_K = 10  # collocations reported per language


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH t AS (SELECT lang, string_split(text, ' ') AS t FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
    bg AS (
        SELECT lang,
               split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2
        FROM (SELECT lang,
                     unnest(list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i + 1])) AS b
              FROM t)
    ),
    c12 AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY lang, w1, w2),
    c1 AS (SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1
           FROM c12 GROUP BY lang, w1),
    c2 AS (SELECT lang, w2, CAST(SUM(c12) AS BIGINT) AS c2
           FROM c12 GROUP BY lang, w2),
    n AS (SELECT lang, CAST(SUM(c12) AS BIGINT) AS n FROM c12 GROUP BY lang),
    scored AS (
        SELECT c12.lang, c12.w1, c12.w2, c12.c12,
               round(ln((CAST(c12.c12 AS DOUBLE) * n.n)
                        / (CAST(c1.c1 AS DOUBLE) * c2.c2)), 6) AS pmi
        FROM c12
        JOIN c1 ON c12.lang = c1.lang AND c12.w1 = c1.w1
        JOIN c2 ON c12.lang = c2.lang AND c12.w2 = c2.w2
        JOIN n ON c12.lang = n.lang
        WHERE c12.c12 >= {_PMI_MIN_COUNT}
    )
    SELECT lang, w1, w2, c12, pmi
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY pmi DESC, w1, w2) AS rn
          FROM scored)
    WHERE rn <= {_PMI_K}
    """,
    tier="P2",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining (Church & Hanks
    1990): the top adjacent word pairs per language whose co-occurrence
    beats chance — PMI(w1,w2) = ln(P(w1,w2) / (P(w1)·P(w2))) computed
    from bigram counts as ln(c12·N / (c1·c2)), with a minimum-count
    floor so rare-pair noise (PMI's known failure mode) never ranks.
    The corpus-analysis primitive behind tokenizer-vocabulary seeding,
    multi-word-expression lexicons, and domain drift readouts.

    Plan shape (the KN-bigram lineage, one extra marginal): one bigram
    explode, one (lang, w1, w2) aggregate, then the THREE marginals —
    left totals, right totals, per-lang grand total — are all
    vocabulary- or lang-sized aggregates OF the bigram-count table, so
    the corpus is touched exactly once and every downstream shuffle is
    bounded by Heaps-law bigram-type counts, not corpus size.  The
    marginal joins are lang+word-keyed equi-joins; none carries a
    broadcast hint (vocabulary grows with the corpus — house rule), so
    AQE broadcasts while small and shuffles past that.  PMI arithmetic
    is identical-operand double math on exact counts but ln is
    libm-divergent → rounded @6; ranking uses the ROUNDED value with
    (w1, w2) tiebreak so both engines sort the identical key.  Counts
    stay exact.
    """
    docs = load(spark, sf_dir, "documents")
    bg = (
        docs.select("lang", F.split(F.col("text"), " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c12 = bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("lang", "w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    c2 = c12.groupBy("lang", "w2").agg(F.sum("c12").cast("bigint").alias("c2"))
    n = c12.groupBy("lang").agg(F.sum("c12").cast("bigint").alias("n"))
    pmi = F.round(
        F.log(
            (F.col("c12").cast("double") * F.col("n"))
            / (F.col("c1").cast("double") * F.col("c2"))
        ),
        6,
    )
    scored = (
        c12.filter(F.col("c12") >= _PMI_MIN_COUNT)
        .join(c1, ["lang", "w1"])
        .join(c2, ["lang", "w2"])
        .join(n, "lang")
        .select("lang", "w1", "w2", "c12", pmi.alias("pmi"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PMI_K)
        .select("lang", "w1", "w2", "c12", "pmi")
    )


# ---------------------------------------------------------------------------
# Cross-document repeated n-grams + per-document novelty (the substring-
# level dedup signals of Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better" — the repeated-span census a substring
# dedup pass is built on, and the memorization-risk readout per doc)

_SHINGLE_W = 8  # tokens per sliding shingle

_SHINGLE_CTES = f"""toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
        SELECT doc_id,
               array_to_string(t[i:i + {_SHINGLE_W - 1}], ' ') AS shingle
        FROM (SELECT doc_id, t,
                     unnest(generate_series(1, len(t) - {_SHINGLE_W - 1}))
                         AS i
              FROM toks
              WHERE len(t) >= {_SHINGLE_W})
    )"""


# Sliding shingle windows over split(text, ' '), GUARDED for short
# documents: sequence(a, b) counts DOWN when b < a, so an unguarded
# sequence(1, size-7) on a <8-token doc yields [1, 0, ...] and
# slice(arr, 0, 8) throws INVALID_PARAMETER_VALUE.START.  The oracle
# CTE's WHERE len(t) >= 8 passes short docs through with zero
# shingles; this CASE is the Spark twin of that predicate.  The
# ELSE branch is cast so both arms type-unify to array<string>.
_SHINGLE_WINDOWS_SQL = (
    f"CASE WHEN size(split(text, ' ')) >= {_SHINGLE_W} THEN "
    f"transform(sequence(1, size(split(text, ' ')) - {_SHINGLE_W - 1}),"
    f" i -> array_join(slice(split(text, ' '), i, {_SHINGLE_W}), ' ')) "
    f"ELSE CAST(array() AS array<string>) END"
)


# Second-seed column for the 128-bit shingle fingerprint (any fixed
# int works; appending it to the hash input yields an independent
# 64-bit stream from the same codegen primitive).
_SHINGLE_SEED2 = 7919


def _with_shingle_hash(sh: DataFrame) -> DataFrame:
    """Attach the 128-bit shuffle key (h1, h2) = xxhash64 pair of the
    shingle string.

    WHY xxhash64 and not exprs.poly_hash: the shingle stream is
    OCCURRENCE-proportional (~2.7 B rows at the 1000× tier), and
    poly_hash is a higher-order-function lambda — interpreted per row,
    the measured 40× trap (round 8: countmin 83 s → 1.3 s).  xxhash64
    is a JVM whole-stage-codegen expression, so the hash costs one
    native pass over bytes already in hand.  It is NOT cross-engine
    replayable, but it never needs to be: the pair is only a GROUPING
    key, never emitted, and grouping by a 128-bit fingerprint equals
    grouping by the string unless two distinct shingles collide in
    BOTH independent 64-bit streams — P ≈ n²/2¹²⁹, ~1.5e-15 even at
    n = 10¹² distinct shingles (100 TB tier) — so the DuckDB oracles
    keep grouping by the raw string, bit-identical.

    Caveat (non-adversarial bound): that P assumes RANDOM input.
    xxhash64 is non-cryptographic and h2 is a seed-variant of h1 (same
    primitive, appended constant), not an independent stream, so
    adversarially crafted text could forge a 128-bit collision far
    below the birthday bound.  The census ops would miscount one row;
    the REMOVAL ops (dedup_span_repeated / stream_span_dedup) inherit
    the key and would silently delete a wrong span.  For a corpus with
    hostile authors, swap h1/h2 for a keyed cryptographic pair
    (e.g. two SipHash keys) at ~2-3× hash cost — same plan shape."""
    return sh.withColumn("h1", F.xxhash64("shingle")).withColumn(
        "h2", F.xxhash64("shingle", F.lit(_SHINGLE_SEED2))
    )


def _doc_shingles(
    spark: SparkSession, sf_dir: str, *, pos: bool = False
) -> DataFrame:
    """(doc_id[, i], shingle, h1, h2) — every SLIDING {_SHINGLE_W}-token
    window of every document (contrast dedup_segment_global's disjoint
    fixed segments: sliding windows catch a repeated span at ANY
    alignment, which is why substring dedup uses them), fingerprinted
    for int-keyed shuffles.  The Spark twin of ``_SHINGLE_CTES``;
    ``pos=True`` adds the 1-based window start ``i`` (posexplode is
    0-based; +1 matches the oracle's generate_series(1, …)).  The
    string column is built in the same projection the hash consumes —
    downstream plans that never select it shuffle ints only (Catalyst
    prunes it at the Exchange)."""
    docs = load(spark, sf_dir, "documents")
    windows = F.expr(_SHINGLE_WINDOWS_SQL)
    if pos:
        sh = docs.select(
            "doc_id", F.posexplode(windows).alias("i0", "shingle")
        ).select("doc_id", (F.col("i0") + 1).alias("i"), "shingle")
    else:
        sh = docs.select("doc_id", F.explode(windows).alias("shingle"))
    return _with_shingle_hash(sh)


@query(
    "text_repeated_ngrams",
    oracle=f"""
    WITH {_SHINGLE_CTES},
    per_doc AS (
        SELECT shingle, doc_id, CAST(COUNT(*) AS BIGINT) AS occ
        FROM sh GROUP BY shingle, doc_id
    )
    SELECT shingle,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(occ) AS BIGINT) AS n_occurrences
    FROM per_doc
    GROUP BY shingle
    HAVING COUNT(*) >= 2
    """,
    tier="P2",
)
def text_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated n-gram census: every sliding 8-token
    shingle that occurs in ≥ 2 DISTINCT documents, with its document
    frequency and total occurrence count — the span inventory a
    substring-level dedup pass (Lee et al. 2021's ExactSubstr) removes,
    and the direct measurement of how much boilerplate the corpus
    carries at a given span width.

    Plan (round-10 rework — the round-9 1000× probe bent at 43.5
    µs/row because ~2.7 B raw shingle STRINGS spilled through both
    shuffles): ALL-INT end to end.  One posexplode (sliding windows
    via transform(sequence) — JVM codegen, no Python) → per-(h1, h2,
    doc) count carrying min(position) → per-(h1, h2) rollup with the
    df ≥ 2 filter, carrying min(struct(doc_id, position)) — the
    lexicographically-first OCCURRENCE COORDINATE of the span, where
    (h1, h2) is the 128-bit xxhash64 fingerprint (_with_shingle_hash —
    collision accounting there).  The emitted shingle text is REBUILT from
    that coordinate: one equi-join of the df ≥ 2 survivors against the
    documents table on doc_id, then slice(split(text), pos, W)
    map-side — so the only strings that ever cross a shuffle are each
    document's text ONCE (corpus-linear, ~7× narrower than the
    occurrence stream), and shingle strings exist only in the final
    projection of emitted rows.  min(struct) over a fingerprint group
    locates the group's unique span absent a 128-bit collision, so
    output and oracle are unchanged from the string-keyed round-9
    form.  Output is TRUE-output-bounded: only spans that actually
    repeat across documents are emitted.

    [MEASURED, round 10 — the honest part] The 1000× re-probe did NOT
    confirm round 9's string hypothesis: an all-int control (the
    reworked novelty, no strings by construction) lands in the same
    400-620 s band, and the bench.py host canary degraded 4.94→6.54 s
    across the probe window — the tier is occurrence-volume
    writeback-bound on one host, with strings a second-order term.
    The byte cut is still plan-asserted
    (tests/test_plan_quality.py::
    test_shingle_census_shuffles_key_on_fingerprint_not_string) and
    is what a cluster keeps; full decomposition in docs/SCALE.md.
    """
    sh = _doc_shingles(spark, sf_dir, pos=True)
    per_doc = sh.groupBy("h1", "h2", "doc_id").agg(
        F.count(F.lit(1)).alias("occ"),
        F.min("i").alias("first_i"),
    )
    census = (
        per_doc.groupBy("h1", "h2")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").cast("bigint").alias("n_occurrences"),
            F.min(F.struct("doc_id", "first_i")).alias("loc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            F.col("loc.doc_id").alias("doc_id"),
            F.col("loc.first_i").alias("rep_i"),
            "n_docs",
            "n_occurrences",
        )
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return census.join(docs, "doc_id").select(
        F.expr(
            f"array_join(slice(split(text, ' '), rep_i, {_SHINGLE_W}), ' ')"
        ).alias("shingle"),
        "n_docs",
        "n_occurrences",
    )


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH {_SHINGLE_CTES},
    distinct_sh AS (SELECT DISTINCT doc_id, shingle FROM sh),
    df AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
        FROM distinct_sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE df.df = 1) AS BIGINT) AS n_novel,
           CAST(COUNT(*) FILTER (WHERE df.df = 1) AS DOUBLE) / COUNT(*)
               AS novelty
    FROM distinct_sh s JOIN df ON s.shingle = df.shingle
    GROUP BY s.doc_id
    """,
    tier="P2",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the share of a document's distinct
    8-token shingles that occur in NO other document — the
    memorization/boilerplate score dual to ``text_repeated_ngrams``
    (novelty 1.0 = fully original text; low novelty = the document is
    assembled from spans the corpus already contains, the first thing
    a training-data curator down-weights and the signal Lee et al.
    2021 report as 'memorized continuations come from repeated text').
    Domain: documents with ≥ 8 tokens (shorter docs have no spans at
    this width).

    Plan (round-10 rework, shared with the census): the sliding-shingle
    explode projected to (doc_id, h1, h2) — the output never emits the
    shingle, so the STRING IS DROPPED AT THE SOURCE (Catalyst prunes
    it at the first Exchange) — → distinct (doc, fingerprint) →
    fingerprint document frequency (one aggregate, map-side combine) →
    join back on the fingerprint → per-doc conditional rollup.  Every
    shuffle carries three ints; grouping by the 128-bit fingerprint
    equals grouping by the shingle (_with_shingle_hash collision
    accounting), so the string-keyed DuckDB oracle is unchanged.
    Corpus-linear, no pair work (novelty needs only df, never which
    OTHER doc shares the span).  novelty = n_novel / n_shingles is an
    identical-operand division of exact ints — UNROUNDED per the
    exprs.py boundary rule.
    """
    sh = _doc_shingles(spark, sf_dir).select("doc_id", "h1", "h2").distinct()
    df_ = sh.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("df"))
    novel = F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("bigint")
    return (
        sh.join(df_, ["h1", "h2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
    )


@query(
    "corpus_lang_confusion",
    oracle=f"""
    WITH {_LANG_ID_CTES},
    pred AS (
        SELECT doc_id, {_LANG_PRED_CASE} AS predicted_lang
        FROM scored
    ),
    conf AS (
        SELECT d.lang, p.predicted_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred p JOIN documents d ON p.doc_id = d.doc_id
        GROUP BY d.lang, p.predicted_lang
    )
    SELECT lang, predicted_lang, n_docs,
           CAST(n_docs AS DOUBLE)
               / SUM(n_docs) OVER (PARTITION BY lang) AS share
    FROM conf
    """,
    tier="P2",
)
def corpus_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFUSION MATRIX: cross-tabulate the heuristic
    classifier's prediction (``text_lang_id``'s n-gram-profile argmax)
    against the corpus's labeled language — the QA readout a curation
    team reads before trusting automated language routing (per-label
    share on the diagonal = recall per language; off-diagonal mass =
    where mislabeled documents would leak between language buckets).
    On this fixture all languages share one vocabulary so the matrix
    is near-uniform — the contract is the computation, exactly as the
    classifier op documents.

    Plan: the classifier pipeline unchanged (model-sized profile
    broadcast, per-doc fold), then one equi-join back to the labels
    and a |langs|²-bounded rollup; the share divides exact ints over a
    window on that ≤ 25-row table — bounded, trivially not a corpus
    sort.  share is identical-operand division, UNROUNDED (exprs.py
    boundary rule; the s_* scores themselves are order-pinned sums —
    the classifier's determinism argument carries over unchanged).
    """
    preds = text_lang_id(spark, sf_dir).select("doc_id", "predicted_lang")
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    conf = (
        preds.join(docs, "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = F.sum("n_docs").over(Window.partitionBy("lang"))
    return conf.select(
        "lang",
        "predicted_lang",
        "n_docs",
        (F.col("n_docs").cast("double") / total).alias("share"),
    )
