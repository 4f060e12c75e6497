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
