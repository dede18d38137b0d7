"""End-to-end job tests: the reference's two applications recomposed
from engine operators, run over real fixture data."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark import jobs
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


def _partitioned_input(spark, sf_dir, tmp):
    ev = load_table(spark, sf_dir, "events")
    path = os.path.join(tmp, "raw")
    (
        ev.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .withColumn("day", F.dayofmonth("ts"))
        .write.partitionBy("year", "month", "day")
        .parquet(path)
    )
    return path


def test_batch_daily_job_end_to_end(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="job_")
    raw = _partitioned_input(spark, sf_dir, tmp)
    out = os.path.join(tmp, "daily")
    wh = os.path.join(tmp, "warehouse")
    n = jobs.batch_daily_job(
        spark,
        raw,
        out,
        warehouse_path=wh,
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )
    assert n > 0
    daily = spark.read.parquet(out)
    assert {"symbol", "date", "daily_open", "daily_close", "year", "month"} <= set(
        daily.columns
    )
    # warehouse upsert is idempotent: run the whole job again
    n2 = jobs.batch_daily_job(
        spark,
        raw,
        out,
        warehouse_path=wh,
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
    )
    assert n2 == n
    wh_df = spark.read.parquet(wh)
    assert wh_df.groupBy("symbol", "date").count().filter(F.col("count") > 1).count() == 0


def test_batch_daily_job_partition_pruned_run(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="job_")
    raw = _partitioned_input(spark, sf_dir, tmp)
    out = os.path.join(tmp, "daily")
    n = jobs.batch_daily_job(
        spark,
        raw,
        out,
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        id_col="event_id",
        year=2024,
        month=1,
        day=2,
    )
    daily = spark.read.parquet(out)
    assert n == daily.count()
    dates = {r["date"].isoformat() for r in daily.select("date").distinct().collect()}
    assert dates == {"2024-01-02"}


def test_stream_job_end_to_end(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="job_")
    target = os.path.join(tmp, "metrics")
    jobs.stream_job(
        spark,
        f"{sf_dir}/events.parquet",
        target,
        os.path.join(tmp, "ckpt"),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        available_now=True,
    )
    out = spark.read.parquet(target)
    assert out.count() > 0
    assert "last_updated" in out.columns  # P14 stamp on the job path
    assert (
        out.groupBy("symbol", "window_start").count().filter(F.col("count") > 1).count()
        == 0
    )
