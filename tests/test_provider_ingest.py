"""Provider-ingestion normalization + calendar backfill (S5 logic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import ohlcv
from real_time_stock_market_data_pipeline__spark.sources import external


@pytest.fixture()
def provider_frame(spark):
    rows = [
        ("2024-01-01 00:00:00", 10.0, 12.0, 9.0, 11.0, 100, 0.0),
        ("2024-01-02 00:00:00", 11.0, 13.0, 10.0, 12.0, 200, 0.5),
    ]
    return spark.createDataFrame(
        rows, "Date string, Open double, High double, Low double, "
        "Close double, Volume long, Dividends double"
    ).withColumn("Date", F.col("Date").cast("timestamp"))


def test_normalize_renames_stamps_and_drops_extras(spark, provider_frame):
    out = external.normalize_provider_ohlcv(
        provider_frame, symbol="AAPL", batch_id="B1", batch_date="2024-02-01"
    )
    assert out.columns == external.OHLCV_COLUMNS + ["batch_id", "batch_date"]
    assert "Dividends" not in out.columns
    rows = out.orderBy("date").collect()
    assert str(rows[0]["date"]) == "2024-01-01"  # DATE, not timestamp
    assert rows[0]["symbol"] == "AAPL" and rows[0]["batch_id"] == "B1"
    assert rows[0]["open"] == 10.0 and rows[1]["volume"] == 200


def test_normalize_without_stamps_keeps_core_schema(spark, provider_frame):
    out = external.normalize_provider_ohlcv(provider_frame, symbol="MSFT")
    assert out.columns == external.OHLCV_COLUMNS


def test_normalize_rejects_unrecognizable_input(spark):
    bad = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="lacks"):
        external.normalize_provider_ohlcv(bad, symbol="X")


def test_backfill_fills_gaps_with_carried_close(spark):
    rows = [
        ("A", "2024-01-01", 10.0, 12.0, 9.0, 11.0, 100),
        # 01-02, 01-03 missing
        ("A", "2024-01-04", 11.5, 13.0, 11.0, 12.5, 50),
        ("B", "2024-01-02", 5.0, 6.0, 4.0, 5.5, 10),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, date string, open double, high double, "
        "low double, close double, volume long"
    ).withColumn("date", F.col("date").cast("date"))
    out = ohlcv.backfill_ohlcv_calendar(df)
    a = {str(r["date"]): r for r in out.filter(F.col("symbol") == "A").collect()}
    assert sorted(a) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    gap = a["2024-01-02"]
    assert gap["is_backfilled"] and gap["volume"] == 0
    # carried close fills all four price fields on synthesized days
    assert (gap["open"], gap["high"], gap["low"], gap["close"]) == (11.0,) * 4
    real = a["2024-01-04"]
    assert not real["is_backfilled"] and real["close"] == 12.5
    # B spans a single day: no synthesis
    assert out.filter((F.col("symbol") == "B") & F.col("is_backfilled")).count() == 0


def test_backfill_is_calendar_dense_per_symbol(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_ohlcv_backfill,
    )

    out = q_ohlcv_backfill(spark, sf_dir)
    span = out.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        (F.datediff(F.max("date"), F.min("date")) + 1).alias("days"),
    )
    assert span.filter(F.col("n") != F.col("days")).count() == 0


def test_fetch_ohlcv_history_gate_is_loud(spark):
    with pytest.raises(NotImplementedError, match="yfinance"):
        external.fetch_ohlcv_history(spark, ["AAPL"])
