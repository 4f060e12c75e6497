"""Pluggable stream-source adapters (SURVEY.md §2.1 `source_kafka_adapter`).

The reference's native source is a Kafka direct stream [RECON,
SURVEY.md:182]; this container has no Kafka broker and no
spark-sql-kafka connector jar, so the adapter layer makes the source a
swappable interface: production wires `KafkaSourceAdapter`, tests and
the bounded-replay harness wire `FileReplayAdapter` — everything
downstream of `.stream()` is identical DataFrame lineage.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamSourceAdapter(Protocol):
    """A source of the typed telemetry stream."""

    def stream(self, spark: SparkSession) -> DataFrame:
        """Return an unbounded (streaming) DataFrame of typed events."""
        ...


@dataclass(frozen=True)
class FileReplayAdapter:
    """Bounded file-source replay of the events fixture — the offline /
    test implementation of the adapter interface."""

    sf_dir: str

    def stream(self, spark: SparkSession) -> DataFrame:
        from powertrainstreaming_spark.streaming.harness import events_stream

        return events_stream(spark, self.sf_dir)


def parse_event_payload(raw: DataFrame, ts_unit: str = "micros") -> DataFrame:
    """Parse a `value`-column JSON payload stream/frame into the typed
    events columns the file adapter produces.

    The payload contract: `ts` is an epoch INTEGER in `ts_unit`
    ('micros' standard, matching the batch loader's normalized
    TIMESTAMP; 'nanos' producers get the same truncating div-1000 shim
    as nanos parquet files).  Factored out of the Kafka adapter so the
    parse+shim contract is unit-testable without a broker — the
    adapter-agnostic claim is verified in tests/test_adapters.py by
    round-tripping fixture rows through JSON.
    """
    if ts_unit not in ("micros", "nanos"):
        raise ValueError(f"ts_unit must be 'micros' or 'nanos', got {ts_unit!r}")
    payload_ddl = (
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), payload_ddl).alias("e")
    ).select("e.*")
    shim = (
        "timestamp_micros(ts div 1000)"
        if ts_unit == "nanos"
        else "timestamp_micros(ts)"
    )
    return parsed.withColumn("ts", F.expr(shim))


@dataclass(frozen=True)
class KafkaSourceAdapter:
    """Kafka direct-stream source (the reference's native shape).

    Requires the spark-sql-kafka connector on the classpath and a
    reachable broker — neither exists in this container, so `stream()`
    raises a clear error instead of a cryptic DATA_SOURCE_NOT_FOUND
    deep inside a query.  The value payload is JSON with the events
    schema; parsing is from_json into the same typed columns the file
    adapter produces, so downstream plans are adapter-agnostic.
    """

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"
    options: dict[str, str] = field(default_factory=dict)
    # Payload contract: `ts` in the JSON is an epoch integer in this
    # unit.  Standardized on micros (matching the batch loader's
    # normalized TIMESTAMP); producers still emitting nanos set 'nanos'
    # and get the same truncating div-1000 shim as nanos parquet files.
    ts_unit: str = "micros"

    def stream(self, spark: SparkSession) -> DataFrame:
        try:
            reader = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", self.bootstrap_servers)
                .option("subscribe", self.topic)
                .option("startingOffsets", self.starting_offsets)
            )
            for k, v in self.options.items():
                reader = reader.option(k, v)
            raw = reader.load()
        except Exception as exc:  # connector jar absent in this env
            raise RuntimeError(
                "Kafka source unavailable: the spark-sql-kafka connector "
                "is not on the classpath (offline container). Use "
                "FileReplayAdapter for bounded replay, or submit with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13."
            ) from exc
        return parse_event_payload(raw, self.ts_unit)


def get_adapter(kind: str, **kwargs) -> StreamSourceAdapter:
    """Adapter registry: 'file' (offline replay) or 'kafka'."""
    if kind == "file":
        return FileReplayAdapter(**kwargs)
    if kind == "kafka":
        return KafkaSourceAdapter(**kwargs)
    raise KeyError(f"unknown stream adapter {kind!r}; know ['file', 'kafka']")
