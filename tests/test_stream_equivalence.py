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
