"""Stream-source adapter contract (SURVEY.md §2.1)."""

from __future__ import annotations

import pytest

from powertrainstreaming_spark.sources.stream_adapters import (
    FileReplayAdapter,
    KafkaSourceAdapter,
    get_adapter,
)


def test_registry_resolves_adapters():
    assert isinstance(get_adapter("file", sf_dir="/tmp"), FileReplayAdapter)
    assert isinstance(
        get_adapter("kafka", bootstrap_servers="b:9092", topic="t"),
        KafkaSourceAdapter,
    )
    with pytest.raises(KeyError):
        get_adapter("socket")


def test_kafka_adapter_fails_clearly_offline(spark):
    """Without the connector jar, stream() must raise the explanatory
    RuntimeError, not a deep DATA_SOURCE_NOT_FOUND."""
    adapter = KafkaSourceAdapter(bootstrap_servers="localhost:9092", topic="events")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        adapter.stream(spark)


def test_file_adapter_is_streaming(spark, sf_small):
    sdf = FileReplayAdapter(sf_dir=sf_small).stream(spark)
    assert sdf.isStreaming


def test_payload_parse_roundtrips_batch_rows(spark, sf_small):
    """The Kafka payload contract, verified without a broker: fixture
    events serialized to the JSON payload (ts as epoch-MICROS int) and
    parsed back must equal the batch loader's rows bit-for-bit —
    downstream plans are adapter-agnostic only if this holds."""
    from pyspark.sql import functions as F

    from powertrainstreaming_spark.sources.loaders import load
    from powertrainstreaming_spark.sources.stream_adapters import (
        parse_event_payload,
    )
    from powertrainstreaming_spark.testing import canonical_hash

    batch = load(spark, sf_small, "events")
    payload = batch.select(
        F.to_json(
            F.struct(
                "event_id",
                F.unix_micros("ts").alias("ts"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        ).alias("value")
    )
    parsed = parse_event_payload(payload, "micros").select(*batch.columns)

    def h(df):
        return canonical_hash([tuple(r) for r in df.collect()], list(df.columns))

    assert h(parsed) == h(batch)
    # nanos producers: same rows after the truncating div-1000 shim.
    payload_ns = batch.select(
        F.to_json(
            F.struct(
                "event_id",
                (F.unix_micros("ts") * 1000).alias("ts"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        ).alias("value")
    )
    parsed_ns = parse_event_payload(payload_ns, "nanos").select(*batch.columns)
    assert h(parsed_ns) == h(batch)

    import pytest

    with pytest.raises(ValueError, match="ts_unit"):
        parse_event_payload(payload, "millis")
