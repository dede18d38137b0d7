"""Streaming EMA: batch-twin equivalence and backpressure option."""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries import (
    q_ema_macd,
    q_stream_ema,
)


def test_stream_ema_equals_batch_ema_fast(spark, sf_dir):
    """The availableNow drain of the stateful streaming EMA must be
    bit-identical to the batch operator's fast EMA (both span 12)."""
    stream = {
        (r.symbol, r.date): (r.close, r.ema)
        for r in q_stream_ema(spark, sf_dir).collect()
    }
    batch = {
        (r.symbol, r.date): (r.close, r.ema_fast)
        for r in q_ema_macd(spark, sf_dir).collect()
    }
    assert stream == batch


def test_max_files_per_trigger_limits_batches(spark, sf_dir, tmp_path):
    """With maxFilesPerTrigger=1 an availableNow drain of N files runs
    N micro-batches — the backpressure valve is honored."""
    import pyspark.sql.functions as F

    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )
    from real_time_stock_market_data_pipeline__spark.streaming.pipeline import (
        read_file_stream,
    )

    src_dir = str(tmp_path / "files")
    ev = load_table(spark, sf_dir, "events").limit(100)
    for i in range(3):
        ev.withColumn("value", F.col("value") + i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    stream = read_file_stream(spark, src_dir, max_files_per_trigger=1)
    q = (
        stream.writeStream.format("memory")
        .queryName("mfpt_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = {p.batchId for p in q.recentProgress if p.numInputRows > 0}
    assert spark.table("mfpt_probe").count() == 300
    assert len(batches) >= 3
