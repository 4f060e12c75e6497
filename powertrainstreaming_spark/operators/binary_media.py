"""Multimodal binary-column plumbing (image/audio/video pattern).

Large-scale multimodal pipelines carry media as opaque BINARY columns
with typed metadata alongside, and run decode / feature-extract /
resize / frame-sample as Arrow-batched pandas stages over mapInPandas.
This module implements that plumbing end-to-end with REAL Spark
mechanics — binary payload column, typed metadata schema, mapInPandas
batch iteration, per-batch feature extraction — while the actual media
codec is stubbed: the container has no image/audio libraries, so
`_decode_payload` is a deterministic fake standing in for e.g. a
JPEG decode (`NotImplementedError` marks the real-codec branch).

The payload here is the document text UTF-8 encoded: the only binary
column derivable from the fixtures, and enough to exercise every piece
of the plumbing (bytes in Arrow buffers, per-batch pandas work, typed
feature output, SQL-oracle verification of byte-level features).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from powertrainstreaming_spark.plans.registry import query
from powertrainstreaming_spark.sources.loaders import load

# Worker-side callables in this module are shipped pickled BY VALUE, so
# executors never need this package importable (the external driver's
# cwd / PYTHONPATH is not ours to control — found via an sf0.1 sweep run
# from a foreign cwd, where every worker raised ModuleNotFoundError).
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

_FEATURE_SCHEMA = (
    "doc_id BIGINT, mime STRING, n_bytes BIGINT, first_byte INT, checksum BIGINT"
)


def _decode_payload(payload: bytes, mime: str) -> dict:
    """Stub media decoder.

    For real media types this is where the codec runs (PIL / ffmpeg /
    torchaudio — not installed in this container).  The text/plain
    branch computes deterministic byte-level features so the Spark-side
    plumbing is fully testable.
    """
    if mime != "text/plain":
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment; real deployments "
            "plug PIL/ffmpeg here — the Spark plumbing is unchanged."
        )
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "checksum": sum(payload),
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: iterate Arrow batches, decode each payload,
    emit typed features.  Partition-local — no shuffle."""
    for pdf in batches:
        feats = [_decode_payload(p, m) for p, m in zip(pdf["payload"], pdf["mime"])]
        out = pd.DataFrame(feats)
        out.insert(0, "mime", pdf["mime"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out[["doc_id", "mime", "n_bytes", "first_byte", "checksum"]]


@query(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id, 'text/plain' AS mime,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(list_sum(list_transform(string_split(text, ''),
                                        c -> ascii(c))) AS BIGINT) AS checksum
    FROM documents
    """,
    tier="P2",
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: text → BINARY payload + mime metadata →
    mapInPandas decode/feature-extract → typed features.

    The oracle recomputes the byte features in SQL (the corpus is pure
    ASCII [MEASURED], so code points ≡ bytes), proving the binary
    round trip through Arrow is byte-exact.  At 100 TB: payloads stay
    in Arrow buffers executor-side, the decode stage is map-only, and
    feature columns (not payloads) flow into downstream joins — the
    shuffle never carries media bytes.
    """
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
    return with_payload.mapInPandas(_extract_features, _FEATURE_SCHEMA)


_FRAME_BYTES = 64  # bytes per sampled "frame"
_FRAME_STRIDE = 256  # sample one frame every 256 payload bytes

_FRAME_SCHEMA = "doc_id BIGINT, frame_no INT, offset BIGINT, checksum BIGINT"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage with 1→N row FAN-OUT: each payload yields one
    row per sampled frame (video frame-sampling shape).  The fan-out
    happens inside the Arrow batch — no explode shuffle, no payload
    copy per frame."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            frame_no = 0
            for off in range(0, n - _FRAME_BYTES + 1, _FRAME_STRIDE):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "frame_no": frame_no,
                        "offset": off,
                        "checksum": sum(payload[off : off + _FRAME_BYTES]),
                    }
                )
                frame_no += 1
        yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "offset", "checksum"])


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, (strlen(text) - {_FRAME_BYTES})
                               // {_FRAME_STRIDE} + 1)) AS i
        FROM documents
        WHERE strlen(text) >= {_FRAME_BYTES})
    SELECT doc_id,
           CAST(i AS INT) AS frame_no,
           CAST(i * {_FRAME_STRIDE} AS BIGINT) AS offset,
           CAST(list_sum(list_transform(
                string_split(substr(text, i * {_FRAME_STRIDE} + 1,
                                    {_FRAME_BYTES}), ''),
                c -> ascii(c))) AS BIGINT) AS checksum
    FROM f
    """,
    tier="P2",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary media: every payload emits one row
    per sampled fixed-size frame (stride 256, frame 64 bytes) — the
    video decode-and-sample shape, where a real deployment swaps the
    byte-window stub for an ffmpeg keyframe extractor with the SAME
    1→N mapInPandas contract.

    The oracle re-derives each frame's byte window in SQL (ASCII
    corpus: substr positions ≡ byte offsets), so the fan-out row set —
    count, offsets, checksums — is hash-verified, not just counted.
    At 100 TB the fan-out multiplies rows ~n/stride map-side BEFORE
    any shuffle; downstream ops see small typed rows, never payloads.
    """
    docs = load(spark, sf_dir, "documents")
    with_payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return with_payload.mapInPandas(_sample_frames, _FRAME_SCHEMA)
