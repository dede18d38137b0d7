"""Regression guard for tz-naive parquet timestamps (the round-4 red).

pandas/pyarrow write timestamps without a timezone annotation by
default; Spark (with its default ``inferTimestampNTZ``) reads those as
TIMESTAMP_NTZ, which ``withWatermark`` and ``unix_micros`` reject.
The engine must normalize both known `ts` shapes — legacy
TIMESTAMP(NANOS) and tz-naive ``timestamp[us]`` — to a plain UTC
TIMESTAMP in batch and streaming readers alike.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.sources.registry import load_table
from real_time_stock_market_data_pipeline__spark.streaming import pipeline


@pytest.fixture(scope="module")
def ntz_events_dir():
    """An events.parquet whose ts is timestamp[us] with NO timezone —
    byte-for-byte the shape pandas.DataFrame.to_parquet produces."""
    d = tempfile.mkdtemp(prefix="ntz_")
    ts = [datetime(2024, 1, 1, 0, 0, i, 123456) for i in range(60)]
    table = pa.table(
        {
            "event_id": pa.array(range(60), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),  # no tz annotation
            "user_id": pa.array([i % 5 for i in range(60)], pa.int64()),
            "event_type": pa.array(["click"] * 60),
            "value": pa.array([float(i) for i in range(60)]),
            "props": pa.array(["{}"] * 60),
        }
    )
    assert table.schema.field("ts").type.tz is None
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


def test_load_table_normalizes_ntz_to_timestamp(spark, ntz_events_dir):
    df = load_table(spark, ntz_events_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # the exact calls that threw AnalysisException in round 4
    micros = df.select(F.unix_micros("ts").alias("us")).orderBy("us").first()["us"]
    assert micros == 1704067200123456  # value-identical UTC reading
    df.withWatermark("ts", "1 minutes")


def test_read_file_stream_normalizes_ntz(spark, ntz_events_dir, tmp_path):
    src = pipeline.read_file_stream(
        spark, os.path.join(ntz_events_dir, "events.parquet")
    )
    assert dict(src.dtypes)["ts"] == "timestamp"
    q = pipeline.stream_realtime_metrics(
        src,
        target_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        available_now=True,
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() > 0


def test_ntz_normalization_survives_foreign_session_conf(spark, ntz_events_dir):
    """The correctness driver hands the engine an externally-created
    session; even if that session has inferTimestampNTZ enabled,
    load_table must still return a plain timestamp column."""
    orig = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        df = load_table(spark, ntz_events_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", orig)
