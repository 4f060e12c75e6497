"""Decompose _tau_pairs edge derivation and A/B the size-carry variant.

Baseline prefix pipeline computes per-doc set size n via a separate
groupBy(doc_id).count() aggregate + join (dedup.py:434), even though
rep_toks explodes grp.codes where n = size(codes) is free (count of
exploded rows == array size, exact by construction).  Round 11 applied
exactly this to the minhash family (with_n=True inside the signature
aggregate); _tau_pairs never got it.

Order-controlled A/B in one JVM: shared checkpointed grp, BASELINE
FIRST so warmup favors it.  Stages timed with count() (ratio probe);
full-op wall with the noop sink.  Equality: cands exceptAll both ways.

    python scripts/probe_tau_ncarry.py [10]   # optional 10x tier

RESULT [MEASURED round 12, degraded-host window, relative A/B valid]:
REJECTED.  sf0.1: cands 2.51 vs 2.54 s, full 4.61 vs 4.73 s (parity);
10x tier: cands 3.74 vs 4.65 s, full 9.30 vs 14.28 s (n-carry LOSES
-53% end-to-end).  Carrying n widens the OCCURRENCE-proportional
token exchange by 8 B/row to delete a DOC-proportional, map-side-
partial-aggregated exchange — strictly more shuffle bytes at any
tokens-per-doc > 1.  exceptAll 0/0 both tiers (outputs identical).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["TZ"] = "UTC"
time.tzset()

from pyspark.sql import Window
from pyspark.sql import functions as F

from powertrainstreaming_spark.operators.dedup import (
    _collapse_sets,
    _doc_tokens,
    _verify_expand,
    _JAC_TAU_NUM,
    _JAC_TAU_DEN,
)
from powertrainstreaming_spark.session import get_spark

TIER10 = len(sys.argv) > 1 and sys.argv[1] == "10"


def cands_from(grp, carry_n: bool):
    if carry_n:
        rep_toks = grp.select(
            F.col("rep").alias("doc_id"),
            F.size("codes").alias("n"),
            F.explode("codes").alias("token"),
        )
        df_ = rep_toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        ranked = rep_toks.join(df_, "token").withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "token")
            ),
        )
    else:
        rep_toks = grp.select(
            F.col("rep").alias("doc_id"), F.explode("codes").alias("token")
        )
        df_ = rep_toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        sizes = rep_toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        ranked = (
            rep_toks.join(df_, "token")
            .join(sizes, "doc_id")
            .withColumn(
                "pos",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy("df", "token")
                ),
            )
        )
    prefix_len = (
        F.col("n") * (_JAC_TAU_DEN - _JAC_TAU_NUM)
    ).cast("bigint") / F.lit(_JAC_TAU_DEN)
    prefix_len = F.floor(prefix_len).cast("bigint") + 1
    prefix = ranked.filter(F.col("pos") <= prefix_len).select(
        "doc_id", "token", "n"
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "token", F.col("n").alias("na")
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("token").alias("token_b"),
        F.col("n").alias("nb"),
    )
    return (
        pa.join(
            pb,
            (F.col("token") == F.col("token_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("na") * _JAC_TAU_DEN >= F.col("nb") * _JAC_TAU_NUM)
            & (F.col("nb") * _JAC_TAU_DEN >= F.col("na") * _JAC_TAU_NUM),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="pts-tau-decomp")
    sc = spark.sparkContext
    sf_dir = "/root/testdata/sf0.1"
    if TIER10:
        sys.path.insert(0, "/root/repo/scripts")
        from scale_probe import _stage_into, _STAGE10
        _stage_into(_STAGE10, 10)
        sf_dir = _STAGE10
        spark.conf.set("spark.sql.shuffle.partitions", "64")

    # warm codegen/JIT on a tiny SF first
    toks_w = _doc_tokens(spark, "/root/testdata/sf0.01")
    gw = _collapse_sets(toks_w, "jaccard")
    noop(_verify_expand(cands_from(gw, carry_n=False), gw))
    noop(_verify_expand(cands_from(gw, carry_n=True), gw))

    toks = _doc_tokens(spark, sf_dir)

    sc.setJobDescription("collapse")
    t0 = time.perf_counter()
    grp = _collapse_sets(toks, "jaccard")
    t_collapse = time.perf_counter() - t0
    print(f"collapse (build+ckpt):      {t_collapse:7.2f} s", flush=True)

    for label, carry in (("baseline sizes-agg", False), ("n-carry", True)):
        sc.setJobDescription(f"cands {label}")
        t0 = time.perf_counter()
        n_c = cands_from(grp, carry).count()
        dt = time.perf_counter() - t0
        print(f"cands {label:20s} {dt:7.2f} s  {n_c} cands", flush=True)

    for label, carry in (("baseline sizes-agg", False), ("n-carry", True)):
        sc.setJobDescription(f"full {label}")
        t0 = time.perf_counter()
        noop(_verify_expand(cands_from(grp, carry), grp))
        dt = time.perf_counter() - t0
        print(f"full  {label:20s} {dt:7.2f} s", flush=True)

    sc.setJobDescription("equality")
    a = cands_from(grp, False)
    b = cands_from(grp, True)
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"cands exceptAll: {d1} / {d2} (both must be 0)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
