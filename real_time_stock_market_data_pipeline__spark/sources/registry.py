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

from real_time_stock_market_data_pipeline__spark import schemas
from real_time_stock_market_data_pipeline__spark.functions.cleaning import (
    event_time_from_nanos,
)

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


def default_sf_dir() -> str:
    """$SPARK_GRAFT_SF_DIR, else the driver's sf0.1 bench directory."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str | None, name: str) -> DataFrame:
    """One synthetic table (TESTDATA.md): `{sf_dir}/{name}.parquet`.

    ``events`` needs special handling: its parquet `ts` column has
    shipped in two shapes across driver generations — TIMESTAMP(NANOS)
    (unreadable by Spark unless
    ``spark.sql.legacy.parquet.nanosAsLong=true``, then converted back
    to a timestamp, losslessly for µs-aligned data) and tz-naive
    ``timestamp[us]`` (surfacing as TIMESTAMP_NTZ unless
    ``spark.sql.parquet.inferTimestampNTZ.enabled=false``). Both confs
    are set here defensively — the correctness driver hands us its own
    session — and both shapes are normalized to a plain TIMESTAMP
    column (session tz is UTC, so the NTZ cast is value-identical).
    """
    sf_dir = sf_dir or default_sf_dir()
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", event_time_from_nanos("ts"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", df["ts"].cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
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

    A requested predicate on a column the dataset does not expose is an
    error, not a silent full scan: the reference's glob approach at least
    failed to match anything, so dropping the predicate here would be a
    new wrong-result path.
    """
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        schema = schemas.REGISTRY.get(os.path.basename(path.rstrip("/")))
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
    df = reader.load(path)
    for colname, val in (("year", year), ("month", month), ("day", day)):
        if val is None:
            continue
        if colname not in df.columns:
            raise ValueError(
                f"read_partitioned({path!r}): predicate {colname}={val} requested "
                f"but dataset has no {colname!r} column (columns: {df.columns}); "
                "refusing to return an unpruned full scan"
            )
        df = df.filter(df[colname] == val)
    return df
