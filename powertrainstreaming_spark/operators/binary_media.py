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
