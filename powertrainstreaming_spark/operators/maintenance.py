"""Table-maintenance operators — partitioned layout + small-file
compaction (SURVEY.md §2.12 engine extensions).

A 100 TB corpus is only queryable at interactive cost if its physical
layout cooperates: hive-partitioned directories let scans prune whole
partitions before reading a byte, and periodic compaction keeps file
counts sane (streaming sinks and incremental loads emit thousands of
KB-sized files whose per-file open cost dominates the scan).

Both operators here write a scratch layout, run the maintenance /
pruned read, and return the re-read rows, so the oracle verifies the
full round trip.
"""

from __future__ import annotations

import glob
import os

from powertrainstreaming_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import TABLE_DDL, load

_PRUNE_LANGS = ("en", "de")


def _partitioned_docs_dir(spark: SparkSession, sf_dir: str) -> str:
    out = scratch_dir(prefix="pts_part_docs_")
    docs = load(spark, sf_dir, "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    return out


# Read-back schema: data columns first, the partition column last (its
# value comes from the directory name).  Declared, not inferred — an
# EMPTY layout (zero partitions, e.g. day one of a tenant) has no files
# to infer from, and partition-value type inference is a determinism
# hole besides.
_PART_DOCS_DDL = (
    "doc_id BIGINT, text STRING, source STRING, n_chars BIGINT, lang STRING"
)


def pruned_docs_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pruned scan itself (plan-asserted in tests): the lang
    predicate is a PartitionFilter — non-matching lang=... directories
    are never opened."""
    out = _partitioned_docs_dir(spark, sf_dir)
    docs = spark.read.schema(_PART_DOCS_DDL).parquet(out)
    return docs.filter(F.col("lang").isin(*_PRUNE_LANGS))


@query(
    "scan_partition_pruned",
    oracle=f"""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE lang IN {_PRUNE_LANGS!r}
    GROUP BY lang, source
    """,
    tier="P2",
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned write + partition-pruned read-back: documents
    are laid out as lang=<v>/part-*.parquet, and a filter on the
    partition column prunes at the DIRECTORY level — the scan node
    carries it as a PartitionFilter, not a data filter
    (tests/test_properties.py asserts this on the physical plan).

    At 100 TB partition pruning is the difference between scanning a
    corpus and scanning a shard: lang/source/date are the standard
    partition keys of a training-data lake, and every downstream
    operator in this engine composes with this layout unchanged.
    """
    pruned = pruned_docs_scan(spark, sf_dir)
    return pruned.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


_COMPACT_INPUT_FILES = 40
_COMPACT_TARGET_BYTES = 4 * 1024 * 1024


def _parquet_files(d: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]


def compact_dir(spark: SparkSession, src_dir: str, target_bytes: int) -> str:
    """Compact a directory of small parquet files into ~target_bytes
    files.  Sizing reads only filesystem metadata; the rewrite is a
    COALESCE — a narrow dependency that concatenates input partitions
    without a shuffle, so compaction costs one read + one write and
    zero network beyond the reads themselves.  (repartition would
    rebalance perfectly but pays a full shuffle — wrong default for
    maintenance jobs that run continuously at 100 TB.)"""
    total = sum(os.path.getsize(p) for p in _parquet_files(src_dir))
    n_out = max(1, -(-total // target_bytes))  # ceil
    out = scratch_dir(prefix="pts_compacted_")
    spark.read.parquet(src_dir).coalesce(n_out).write.mode("overwrite").parquet(out)
    return out


@query(
    "maintenance_compact_files",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
    tier="P2",
)
def maintenance_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a 40-file shard of events (the layout a
    per-minute streaming sink leaves behind) is rewritten into
    target-sized files, preserving rows exactly — the oracle checks the
    full rewrite round trip, tests assert the file count actually
    shrinks.

    The staged split uses repartition (synthesizing the fragmented
    input); the compaction itself is shuffle-free coalesce.
    """
    frag = scratch_dir(prefix="pts_frag_")
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.repartition(_COMPACT_INPUT_FILES).write.mode("overwrite").parquet(frag)
    compacted = compact_dir(spark, frag, _COMPACT_TARGET_BYTES)
    return spark.read.parquet(compacted).select(
        "event_id", "user_id", "event_type", "value"
    )


_SEVERITY_ROWS = [
    ("1-URGENT", 1),
    ("2-HIGH", 2),
    ("3-MEDIUM", 3),
    ("4-NOT SPECIFIED", 4),
    ("5-LOW", 5),
]
_SEV_MAX = 2

_SEVERITY_VALUES_SQL = ", ".join(f"('{p}', {s})" for p, s in _SEVERITY_ROWS)


def dpp_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DPP join itself (plan-asserted in tests): orders laid out
    partitioned by o_orderpriority, joined on the partition column to a
    severity dimension filtered to sev ≤ 2 — Catalyst inserts a
    dynamicpruning subquery into the fact scan's PartitionFilters, so
    only the 2 matching directories are ever read."""
    out = scratch_dir(prefix="pts_dpp_orders_")
    orders = load(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.schema(
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
    ).parquet(out)
    dim = spark.createDataFrame(_SEVERITY_ROWS, "prio string, sev int")
    return fact.join(
        dim, fact.o_orderpriority == dim.prio
    ).filter(F.col("sev") <= _SEV_MAX)


@query(
    "join_dpp_partitioned",
    oracle=f"""
    SELECT prio, sev,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS total_price
    FROM orders
    JOIN (VALUES {_SEVERITY_VALUES_SQL}) AS dim(prio, sev)
      ON o_orderpriority = prio
    WHERE sev <= {_SEV_MAX}
    GROUP BY prio, sev
    """,
    tier="P2",
)
def join_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the partition filter is not a literal
    (scan_partition_pruned's static case) but the RESULT of the dim
    side's filter, discovered at runtime — Spark broadcasts the
    filtered dim's join keys into the fact scan as a dynamicpruning
    subquery before the fact is read.

    This is the decisive scan-reduction pattern for star joins at
    100 TB: date-dim filters ("last week") prune a date-partitioned
    fact without the query ever naming partition values.  The physical
    plan is asserted in tests/test_plan_quality.py; the oracle is the
    equivalent static join.
    """
    from powertrainstreaming_spark.functions.exprs import money_sum

    return dpp_join_df(spark, sf_dir).groupBy("prio", "sev").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice").alias("total_price"),
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS o_orderstatus
    FROM orders
    """,
    tier="P2",
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations: generation 1 wrote
    (o_orderkey, o_totalprice); generation 2 added o_orderstatus.
    Reading the directory with mergeSchema unifies the footers — old
    files surface the new column as NULL, nothing is rewritten.

    Additive column evolution is how a 100 TB lake actually changes
    shape: rewriting history is off the table, so the reader owns the
    merge.  mergeSchema costs a footer read per file generation (not
    per row) at planning time; production pins the merged schema in a
    catalog and reads with it declared, which is the loaders.py
    discipline applied over time.
    """
    out = scratch_dir(prefix="pts_evolve_")
    orders = load(spark, sf_dir, "orders")
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    gen1.write.mode("overwrite").parquet(os.path.join(out, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(out, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out, "gen=1"), os.path.join(out, "gen=2")
    )
    return merged.select("o_orderkey", "o_totalprice", "o_orderstatus")


# Morton (Z-order) interleave of two 8-bit bucket keys, unrolled to
# pure integer ops so Spark and DuckDB evaluate bit-identically.
_Z_SPARK = "shiftleft(shiftright(xb, 0) & 1, 0) + shiftleft(shiftright(yb, 0) & 1, 1) + shiftleft(shiftright(xb, 1) & 1, 2) + shiftleft(shiftright(yb, 1) & 1, 3) + shiftleft(shiftright(xb, 2) & 1, 4) + shiftleft(shiftright(yb, 2) & 1, 5) + shiftleft(shiftright(xb, 3) & 1, 6) + shiftleft(shiftright(yb, 3) & 1, 7) + shiftleft(shiftright(xb, 4) & 1, 8) + shiftleft(shiftright(yb, 4) & 1, 9) + shiftleft(shiftright(xb, 5) & 1, 10) + shiftleft(shiftright(yb, 5) & 1, 11) + shiftleft(shiftright(xb, 6) & 1, 12) + shiftleft(shiftright(yb, 6) & 1, 13) + shiftleft(shiftright(xb, 7) & 1, 14) + shiftleft(shiftright(yb, 7) & 1, 15)"
_Z_DUCK = "(((xb >> 0) & 1) << 0) + (((yb >> 0) & 1) << 1) + (((xb >> 1) & 1) << 2) + (((yb >> 1) & 1) << 3) + (((xb >> 2) & 1) << 4) + (((yb >> 2) & 1) << 5) + (((xb >> 3) & 1) << 6) + (((yb >> 3) & 1) << 7) + (((xb >> 4) & 1) << 8) + (((yb >> 4) & 1) << 9) + (((xb >> 5) & 1) << 10) + (((yb >> 5) & 1) << 11) + (((xb >> 6) & 1) << 12) + (((yb >> 6) & 1) << 13) + (((xb >> 7) & 1) << 14) + (((yb >> 7) & 1) << 15)"


@query(
    "layout_zorder_cluster",
    oracle=f"""
    WITH b AS (
        SELECT o_custkey % 256 AS xb,
               date_diff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) % 256 AS yb
        FROM orders
    ),
    z AS (SELECT xb, yb, {_Z_DUCK} AS zval FROM b)
    SELECT CAST(zval // 64 AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(xb) AS BIGINT) AS min_cust_bucket,
           CAST(MAX(xb) AS BIGINT) AS max_cust_bucket,
           CAST(MIN(yb) AS BIGINT) AS min_day_bucket,
           CAST(MAX(yb) AS BIGINT) AS max_day_bucket
    FROM z
    GROUP BY 1
    """,
    tier="P2",
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering key over two scan dimensions
    (customer bucket x order-day bucket) — the data-layout primitive
    behind multi-dimensional file skipping (Delta/Iceberg OPTIMIZE
    ZORDER): sorting 100 TB of files by the interleaved key keeps BOTH
    min-max column ranges tight per file, so predicates on EITHER
    dimension prune files, not just the leading sort key.

    The interleave is an unrolled sum of shift/mask integer ops —
    whole-stage-codegen arithmetic, no UDF — and the query reports
    per-z-bucket row counts plus the min-max envelope of both source
    dimensions: the spans are what a file-skipping index would store,
    and their tightness (vs a single-column sort, where the second
    dimension's span is the full domain) is the measurable win.  At
    scale the z_bucket becomes the repartitionByRange key for the
    rewrite; here the aggregate proves the envelope math.
    """
    orders = load(spark, sf_dir, "orders")
    b = orders.select(
        F.expr("pmod(o_custkey, 256)").alias("xb"),
        F.expr(
            "pmod(datediff(cast(o_orderdate as date), date'1992-01-01'), 256)"
        ).alias("yb"),
    )
    z = b.withColumn("zval", F.expr(_Z_SPARK))
    return (
        z.groupBy(F.expr("zval div 64").cast("bigint").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("xb").cast("bigint").alias("min_cust_bucket"),
            F.max("xb").cast("bigint").alias("max_cust_bucket"),
            F.min("yb").cast("bigint").alias("min_day_bucket"),
            F.max("yb").cast("bigint").alias("max_day_bucket"),
        )
    )


# Snapshot files carry the canonical documents schema — one source of
# truth in loaders.TABLE_DDL, so fixture evolution can't drift this.
_DOCS_DDL = TABLE_DDL["documents"]


def _snapshot_table_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage a two-generation manifest table of documents: generation 1
    holds even doc_ids, generation 2 appends the odd ones.  Each
    snapshot manifest is the full FILE LIST visible at that version —
    the same mechanism (minus stats) as an Iceberg/Delta snapshot."""
    import json

    out = scratch_dir(prefix="pts_snap_docs_")
    docs = load(spark, sf_dir, "documents")
    g1 = os.path.join(out, "g1")
    g2 = os.path.join(out, "g2")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(g1)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(g2)
    files_of = lambda d: sorted(glob.glob(os.path.join(d, "*.parquet")))  # noqa: E731
    manifests = {
        "v1": files_of(g1),
        "v2": files_of(g1) + files_of(g2),
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifests, f)
    return out


def read_snapshot(spark: SparkSession, table_dir: str, version: str) -> DataFrame:
    """Time-travel read: load exactly the files the manifest listed at
    ``version`` — files appended by later generations are invisible,
    so the read is snapshot-isolated against concurrent appends."""
    import json

    with open(os.path.join(table_dir, "manifest.json")) as f:
        files = json.load(f)[version]
    return spark.read.schema(_DOCS_DDL).parquet(*files)


@query(
    "scan_snapshot_time_travel",
    oracle="""
    SELECT 'v1' AS snapshot, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    UNION ALL
    SELECT 'v2' AS snapshot, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    tier="P2",
)
def scan_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolated time travel over a manifest-listed parquet
    table: the same aggregate at version v1 (before an append) and v2
    (after) — the mechanism behind reproducible training snapshots
    ("train on the corpus exactly as of manifest N" while ingestion
    keeps appending).

    A snapshot is a file list, so time travel costs a manifest read
    plus a scan of exactly those files — no copy, no delete, and old
    versions stay readable until their files are vacuumed.  At 100 TB
    this is what a table format (Iceberg/Delta) maintains with stats
    and atomic swaps; the operator demonstrates the read path on plain
    parquet with declared schemas, and the append between v1 and v2
    never rewrites generation-1 files (asserted by v1's answer being
    unchanged under the oracle).
    """
    table_dir = _snapshot_table_dir(spark, sf_dir)
    outs = []
    for version in ("v1", "v2"):
        snap = read_snapshot(spark, table_dir, version)
        outs.append(
            snap.groupBy("lang").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            ).select(F.lit(version).alias("snapshot"), "lang", "n_docs", "total_chars")
        )
    return outs[0].unionByName(outs[1])
