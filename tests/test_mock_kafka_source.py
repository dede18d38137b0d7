"""S3/S4 source-path integration evidence without a broker.

`read_kafka_stream` was previously only codec-tested (its decode
projection on batch frames). These tests run its ENTIRE body — the
readStream builder with Kafka options, the wire schema, the decode
projection — under real streaming queries, against the in-process
`mock_kafka` Python data source that presents the exact spark-sql-kafka
wire schema. The producer side is the real `sinks.encode_keyed_json`,
so the round trip is: engine encode → wire bytes → streaming source →
engine decode, i.e. the reference's
`stream_data_producer.py:126-131` → `realtime_data_consumer.py:92` loop
minus only the network.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark import sinks
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table
from real_time_stock_market_data_pipeline__spark.streaming import mock_kafka, pipeline


@pytest.fixture(scope="module")
def wire_messages(spark, sf_dir):
    """Producer side: real tick rows through the real encoder."""
    ev = load_table(spark, sf_dir, "events").orderBy("event_id").limit(50)
    msgs = [
        {"key": r["key"], "value": r["value"]}
        for r in sinks.encode_keyed_json(ev, key_col="event_type").collect()
    ]
    return ev, msgs


def _drain_to_memory(stream, name: str):
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_read_kafka_stream_roundtrips_through_wire(spark, wire_messages):
    ev, msgs = wire_messages
    mock_kafka.register(spark)
    decoded = pipeline.read_kafka_stream(
        spark,
        servers="mock:9092",  # accepted and ignored by the stand-in
        topic="ticks",
        schema=ev.schema,
        source_format="mock_kafka",
        extra_options={"messages": json.dumps(msgs)},
    )
    assert decoded.isStreaming
    _drain_to_memory(decoded, "mock_kafka_out")
    got = spark.table("mock_kafka_out")
    assert got.columns == ["symbol_key"] + ev.columns
    orig = sorted(map(tuple, ev.collect()))
    back = sorted(r[1:] for r in map(tuple, got.collect()))
    assert back == orig  # timestamps and doubles survive the JSON hop


def test_mock_source_presents_kafka_wire_schema(spark, wire_messages):
    """The stand-in's raw output must match the spark-sql-kafka source
    contract exactly — that equivalence is what makes the round-trip
    test evidence for the real source path."""
    _, msgs = wire_messages
    mock_kafka.register(spark)
    raw = (
        spark.readStream.format("mock_kafka")
        .option("subscribe", "ticks")
        .option("messages", json.dumps(msgs))
        .load()
    )
    assert raw.schema == mock_kafka.KAFKA_WIRE_SCHEMA
    _drain_to_memory(raw, "mock_kafka_raw")
    rows = spark.table("mock_kafka_raw").orderBy("offset").collect()
    assert len(rows) == len(msgs)
    assert rows[0]["topic"] == "ticks"
    assert isinstance(rows[0]["key"], (bytes, bytearray))
    assert [r["offset"] for r in rows] == list(range(len(msgs)))


def test_mock_source_drains_in_bounded_batches(spark, wire_messages):
    """messagesPerBatch is the stand-in's maxOffsetsPerTrigger: a
    continuously-triggered query must deliver everything exactly once
    across multiple micro-batches (availableNow snapshots only the
    first batch against a simple stream reader, so this polls a running
    query — the production trigger shape)."""
    import time

    ev, msgs = wire_messages
    mock_kafka.register(spark)
    decoded = pipeline.read_kafka_stream(
        spark,
        servers="mock:9092",
        topic="ticks",
        schema=ev.schema,
        source_format="mock_kafka",
        extra_options={"messages": json.dumps(msgs), "messagesPerBatch": "7"},
    )
    q = (
        decoded.writeStream.format("memory")
        .queryName("mock_kafka_batched")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("mock_kafka_batched").count() >= len(msgs):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table("mock_kafka_batched")
    assert got.count() == len(msgs)
    assert got.select("event_id").distinct().count() == len(msgs)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2  # the drain really crossed micro-batches


def test_kafka_stream_feeds_realtime_metrics_sink(spark, wire_messages, tmp_path):
    """Kafka-shaped source composed with the engine's T1–T10 sink: the
    reference's full consume→window→upsert chain, brokerless."""
    ev, msgs = wire_messages
    mock_kafka.register(spark)
    decoded = pipeline.read_kafka_stream(
        spark,
        servers="mock:9092",
        topic="ticks",
        schema=ev.schema,
        source_format="mock_kafka",
        extra_options={"messages": json.dumps(msgs)},
    )
    q = pipeline.stream_realtime_metrics(
        decoded,
        target_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        symbol_col="symbol_key",
        ts_col="ts",
        price_col="value",
        available_now=True,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0
    assert {"symbol", "window_start"} <= set(out.columns)
    avg_col = next(c for c in out.columns if c.startswith("moving_avg"))
    assert out.filter(F.col(avg_col).isNull()).count() == 0


def test_mock_source_restart_resumes_exactly_once(spark, wire_messages, tmp_path):
    """Stop a checkpointed query mid-drain and restart it: the offset
    log + readBetweenOffsets replay must hand every message to the sink
    exactly once across the two runs — the T4/T10 recovery contract on
    the Kafka-shaped source path."""
    import time

    ev, msgs = wire_messages
    mock_kafka.register(spark)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        decoded = pipeline.read_kafka_stream(
            spark,
            servers="mock:9092",
            topic="ticks",
            schema=ev.schema,
            source_format="mock_kafka",
            extra_options={"messages": json.dumps(msgs), "messagesPerBatch": "7"},
        )
        return (
            decoded.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.2)
    q.stop()  # mid-drain: some batches committed, the rest not

    q2 = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if spark.read.parquet(out_dir).count() >= len(msgs):
                break
        except Exception:
            pass
        time.sleep(0.5)
    q2.stop()

    got = spark.read.parquet(out_dir)
    assert got.count() == len(msgs)  # nothing lost, nothing duplicated
    assert got.select("event_id").distinct().count() == len(msgs)


def test_read_kafka_stream_builds_real_kafka_source_options(spark, wire_messages):
    """The ONE line the mock path can't execute is the default
    ``format("kafka")`` + option wiring (spark-sql-kafka jar absent
    from this container). Drive the full function body with a recording
    reader: assert the exact format string and source options the real
    broker path would receive, while load() hands back genuine wire
    rows so the decode projection still executes and round-trips."""
    ev, msgs = wire_messages

    class RecordingReader:
        def __init__(self, df):
            self._df = df
            self.fmt = None
            self.options: dict[str, str] = {}

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.options[k] = v
            return self

        def load(self):
            return self._df

    class FakeSpark:
        def __init__(self, reader):
            self._reader = reader

        @property
        def readStream(self):
            return self._reader

    wire = sinks.encode_keyed_json(ev, key_col="event_type")
    reader = RecordingReader(wire)
    decoded = pipeline.read_kafka_stream(
        FakeSpark(reader),
        servers="broker1:9092,broker2:9092",
        topic="ticks",
        schema=ev.schema,
        starting_offsets="latest",
        extra_options={"maxOffsetsPerTrigger": "5000"},
    )

    # exactly what a real spark-sql-kafka source would be handed
    assert reader.fmt == "kafka"
    assert reader.options == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "ticks",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "5000",
    }
    # and the decode projection after load() still round-trips the wire
    got = {r["event_id"]: r for r in decoded.collect()}
    for r in ev.collect():
        assert got[r["event_id"]]["symbol_key"] == r["event_type"]
        assert got[r["event_id"]]["value"] == r["value"]
        assert got[r["event_id"]]["ts"] == r["ts"]


def test_real_kafka_format_reaches_datasource_lookup(spark):
    """The ONE line the mock can't cover is the default
    ``format("kafka")`` string itself. Executing it without the
    spark-sql-kafka jar must fail at Spark's data-source LOOKUP with
    the kafka-specific guidance — proving the builder wires the real
    format name end to end; with the jar on the classpath the same
    call is the production path."""
    from pyspark.sql.types import StructType

    try:
        pipeline.read_kafka_stream(
            spark,
            servers="broker:9092",
            topic="ticks",
            schema=StructType(),
        )
        raise AssertionError(
            "expected the kafka data-source lookup to fail without the jar"
        )
    except Exception as exc:
        msg = str(exc)
        assert "kafka" in msg.lower()
        assert (
            "Failed to find" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "structured-streaming-kafka" in msg
        )
