"""Readers for the driver's synthetic parquet tables and for the
reference's at-rest layouts.

Replaces the reference's manual partition-glob construction
(`src/spark/jobs/spark_batch_processor.py:42-69`) with plan-visible
partition-column predicates so Catalyst prunes instead of string glue,
and its pandas object-store loops
(`src/snowflake/realtime_load_to_snowflake.py:93-156`) with plain
`spark.read.parquet` (partition-column recovery is automatic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One synthetic table (TESTDATA.md): `{sf_dir}/{name}.parquet`."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def read_partitioned(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    year: int | None = None,
    month: int | None = None,
    day: int | None = None,
) -> DataFrame:
    """Read a Hive-partitioned dataset (`year=/month=/day=` layout as in
    `batch_data_consumer.py:90`), pruning via partition-column filters —
    the Catalyst-visible equivalent of the reference's glob strings
    (`spark_batch_processor.py:45-52`).
    """
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = reader.load(path)
    for colname, val in (("year", year), ("month", month), ("day", day)):
        if val is not None and colname in df.columns:
            df = df.filter(df[colname] == val)
    return df
