"""In-process Kafka stand-in: a Python streaming data source with the
exact Kafka source wire schema.

The container (and many CI environments) has no broker and no
spark-sql-kafka jar, so the S3/S4 source path
(:func:`real_time_stock_market_data_pipeline__spark.streaming.pipeline.read_kafka_stream`)
could previously only be evidenced at the codec level. This module
closes the gap the Spark-4 way: a ``pyspark.sql.datasource.DataSource``
registered as ``mock_kafka`` that presents the same seven-column wire
schema the real Kafka source does (key/value binary, topic, partition,
offset, timestamp, timestampType), fed from messages passed in as an
option. ``read_kafka_stream(source_format="mock_kafka")`` then runs its
*entire* body — readStream builder, options, decode projection,
downstream query — under a genuine streaming query; the only untested
difference from production is the format string itself.

This mirrors how the reference can only be integration-tested with a
live broker (`src/kafka/consumer/realtime_data_consumer.py:61-143`
polls a real endpoint); here the harness ships with the engine so a
user can test a pipeline end-to-end with zero infrastructure.

``SimpleDataSourceStreamReader`` reads on the driver — appropriate for
a test harness only. Production traffic uses the real ``kafka`` format
whose source plans per-partition reads; this class is not a scale path
and is deliberately not registered by default.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone
from typing import Iterator, Tuple

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The Kafka source's fixed output schema (spark-sql-kafka contract).
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

#: Deterministic log-append timestamps: epoch + offset seconds.
_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


class MockKafkaDataSource(DataSource):
    """``format("mock_kafka")``: replays a fixed message list as a
    stream with Kafka wire semantics.

    Options:
      - ``messages``: JSON array of ``{"key": str, "value": str}``
        objects — the producer's output, e.g. collected from
        ``sinks.encode_keyed_json``.
      - ``subscribe``: topic name stamped on every row (default
        ``mock``).
      - ``messagesPerBatch``: cap on rows per micro-batch (default:
        everything available) — lets tests exercise multi-batch
        draining the way ``maxOffsetsPerTrigger`` does on the real
        source.

    Unknown options (``kafka.bootstrap.servers``, ``startingOffsets``)
    are accepted and ignored, so production reader code runs unchanged.
    """

    @classmethod
    def name(cls) -> str:
        return "mock_kafka"

    def schema(self) -> StructType:
        return KAFKA_WIRE_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> "MockKafkaStreamReader":
        return MockKafkaStreamReader(self.options)


class MockKafkaStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        msgs = json.loads(options.get("messages", "[]"))
        topic = options.get("subscribe", "mock")
        per_batch = int(options.get("messagesperbatch", 0)) or len(msgs) or 1
        self._per_batch = per_batch
        self._rows = [
            (
                m["key"].encode("utf-8") if m.get("key") is not None else None,
                m["value"].encode("utf-8") if m.get("value") is not None else None,
                topic,
                0,
                i,
                _T0 + timedelta(seconds=i),
                0,  # TimestampType.CREATE_TIME
            )
            for i, m in enumerate(msgs)
        ]

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        lo = start["offset"]
        hi = min(lo + self._per_batch, len(self._rows))
        return iter(self._rows[lo:hi]), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: offsets are list indices, so this is exact
        return iter(self._rows[start["offset"] : end["offset"]])


def register(spark: SparkSession) -> None:
    """Register the ``mock_kafka`` format on this session (idempotent)."""
    spark.dataSource.register(MockKafkaDataSource)
