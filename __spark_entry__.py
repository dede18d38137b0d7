"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``real_time_stock_market_data_pipeline__spark.driver_queries`` —
one entry per implemented operator from SURVEY.md §2 plus the
LLM-data-pipeline extensions, with identically-aliased columns on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_stock_market_data_pipeline__spark import driver_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-(symbol, day) OHLCV daily metrics over the
    sf0.001 events table (reference batch core,
    `spark_batch_processor.py:81-101`, re-expressed as one
    min_by/max_by groupBy)."""
    return driver_queries.q_daily_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; each callable takes
    (spark, sf_dir) and returns a DataFrame."""
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query, on the
    pre-registered table views."""
    return dict(driver_queries.ORACLES)


def oracle_py() -> dict[str, Callable]:
    """Python-replay oracles (callable(duckdb_con) -> pandas DataFrame)
    for the few queries whose SQL oracle is correct but impractically
    slow at stress scale factors (the recursive-CTE greedy-packing
    walk). Used only by the local gate's ``--py-oracles`` mode
    (scripts/check_correctness.py); the round driver keeps running the
    ``oracle_sql()`` form at sf0.01."""
    return dict(driver_queries.PY_ORACLES)
