"""Structured Streaming layer (watermarked windows, foreachBatch
sinks, file/rate/Kafka sources). See ``pipeline``."""

from real_time_stock_market_data_pipeline__spark.streaming import pipeline  # noqa: F401
