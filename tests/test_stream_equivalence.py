"""Streaming ↔ batch equivalence (SURVEY.md §5.4 layer 4).

Each §2.10 operator's bounded-stream output must equal its plain-batch
twin BEFORE the oracle ever sees it — this is the test that catches
watermark/emit-semantics drift independently of the DuckDB gate.
"""

from __future__ import annotations

from powertrainstreaming_spark.operators.streaming import (
    sessionize_batch,
    stream_session_window,
    stream_tumbling_agg,
    tumbling_batch,
)
from powertrainstreaming_spark.testing import canonical_hash

SF = "/root/testdata/sf0.001"


def _hash_df(df):
    return canonical_hash([tuple(r) for r in df.collect()], list(df.columns))


def test_tumbling_stream_equals_batch(spark):
    s = stream_tumbling_agg(spark, SF)
    b = tumbling_batch(spark, SF)
    assert sorted(s.columns) == sorted(b.columns)
    assert _hash_df(s) == _hash_df(b)


def test_session_stream_equals_batch(spark):
    s = stream_session_window(spark, SF)
    b = sessionize_batch(spark, SF)
    # Batch twin computes the same 5 columns; align the order.
    b = b.select(*s.columns)
    assert _hash_df(s) == _hash_df(b)


def test_foreachbatch_checkpoint_restart_exactly_once(spark, tmp_path):
    """Operational semantics of the production sink: two AvailableNow
    runs sharing one checkpoint behave like a stopped-and-restarted
    stream.  The restarted run must process ONLY files that arrived
    after the first run (incremental source offsets), and the final
    sink must equal the batch answer over all files with zero
    duplicates (event_id is unique in the fixture) — i.e. end-to-end
    exactly-once across a restart."""
    import os

    import pyarrow.parquet as pq

    from powertrainstreaming_spark.session import ensure_session_confs
    from powertrainstreaming_spark.sources.loaders import (
        events_ddl,
        shim_events_ts,
        table_path,
    )

    ensure_session_confs(spark)
    table = pq.read_table(table_path(SF, "events"))
    third = table.num_rows // 3
    stage = str(tmp_path / "in")
    os.makedirs(stage)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_stream() -> None:
        sdf = shim_events_ts(
            spark.readStream.schema(events_ddl(stage)).parquet(stage), stage
        ).select("event_id", "user_id", "event_type", "value")

        def write_batch(batch_df, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(out)

        q = (
            sdf.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pq.write_table(table.slice(0, third), os.path.join(stage, "a.parquet"))
    pq.write_table(table.slice(third, third), os.path.join(stage, "b.parquet"))
    run_stream()
    assert spark.read.parquet(out).count() == 2 * third

    # "Late" file lands while the stream is down; restart from the
    # same checkpoint.
    pq.write_table(table.slice(2 * third), os.path.join(stage, "c.parquet"))
    run_stream()
    final = spark.read.parquet(out)
    assert final.count() == table.num_rows
    assert final.select("event_id").distinct().count() == table.num_rows
