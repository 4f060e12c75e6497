"""Time-series operators over the events table (engine extensions,
SURVEY.md §2.12).

The reference is a telemetry engine; gap-filling a regularized series
and flagging rolling-window anomalies are the two time-series shapes
its users ask for beyond plain windowed aggregation.  Both are
compositions of built-in DataFrame ops — pre-aggregate first, then
window over the (small) regularized series — so the heavy input scan
stays a map-side partial aggregation and the window state is bounded
by the time range, not the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from powertrainstreaming_spark.functions.exprs import money_avg
from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                   AS avg_value
        FROM events GROUP BY 1, 2
    ),
    spans AS (
        SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM hourly GROUP BY 1
    ),
    grid AS (
        SELECT s.event_type, g.bucket
        FROM spans s,
             LATERAL (SELECT unnest(generate_series(s.lo, s.hi,
                                                    INTERVAL 1 HOUR))
                      AS bucket) g
    )
    SELECT g.event_type, g.bucket,
           COALESCE(h.n_events, CAST(0 AS BIGINT)) AS n_events,
           last_value(h.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket) AS filled_value,
           h.n_events IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly h USING (event_type, bucket)
    """,
    tier="P2",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each event_type's series to an hourly grid and fill
    gaps by last-observation-carried-forward (LOCF) of the hourly mean.

    Plan shape: partial/final hash agg to hourly buckets (the only
    pass over the raw events), a per-type min/max to bound the grid,
    ``sequence``+``explode`` to synthesize the grid rows, a left join
    back to the buckets, and one ordered window for the carry-forward.
    The grid is |types| x |hours| rows — tiny relative to the input at
    any scale, so the join and window cost nothing.  At 100 TB the
    LOCF window's partition key would be (event_type, day-chunk) with
    a per-chunk seed row to keep partitions bounded; the hourly
    pre-aggregation is unchanged.

    Mean is the exact decimal sum divided by the bigint count
    (exprs.py rule 3), carried forward UNROUNDED — both engines then
    window over bit-identical doubles.
    """
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            "value",
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_avg("value").alias("avg_value"),
        )
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    filled = grid.join(hourly, ["event_type", "bucket"], "left")
    w = Window.partitionBy("event_type").orderBy("bucket")
    return filled.select(
        "event_type",
        "bucket",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    SELECT event_id, event_type, ts, value,
           CASE WHEN n >= 30 AND s2 / n - (s / n) * (s / n) > 0
                THEN (value - s / n) / sqrt(s2 / n - (s / n) * (s / n))
           END AS zscore,
           COALESCE(
               CASE WHEN n >= 30 AND s2 / n - (s / n) * (s / n) > 0
                    THEN abs((value - s / n)
                             / sqrt(s2 / n - (s / n) * (s / n))) > 3.0
               END, FALSE) AS is_anomaly
    FROM (
        SELECT event_id, event_type, ts, value,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
               CAST(SUM(CAST(value * value AS DECIMAL(18,6))) OVER w
                    AS DOUBLE) AS s2
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
    )
    """,
    tier="P2",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: each event against the mean/std
    of the trailing 100-row frame within its event_type, flagged when
    |z| > 3 (null z until 30 observations or under zero variance).

    Mean and variance come from exact DECIMAL frame sums of value and
    value^2 (one window pass computes count/sum/sumsq together), so
    both engines derive z from bit-identical doubles — sqrt is IEEE
    correctly-rounded and therefore cross-engine exact, no rounding
    needed (exprs.py rule 2).  ``GREATEST``-style clamping is replaced
    by the ``var > 0`` predicate, identical in both dialects.

    Scale note: partitionBy(event_type) has only |types| partitions —
    the demonstration shape.  At 100 TB the partition key becomes
    (event_type, user_id) or (event_type, day) so frames parallelize;
    the frame arithmetic is identical either way.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-99, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w).cast("bigint")
    s = F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
    s2 = (
        F.sum((F.col("value") * F.col("value")).cast("decimal(18,6)"))
        .over(w)
        .cast("double")
    )
    base = ev.select("event_id", "event_type", "ts", "value",
                     n.alias("n"), s.alias("s"), s2.alias("s2"))
    mean = F.col("s") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = F.when(
        (F.col("n") >= 30) & (var > 0),
        (F.col("value") - mean) / F.sqrt(var),
    )
    return base.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        z.alias("zscore"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )
