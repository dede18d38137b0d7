"""Warehouse wire adapter (K5) and object-store profile tests: the
emitted staged-MERGE SQL must be executable and equivalent to the
engine's merge_upsert; the S3A profile must be pure env-driven conf."""

from __future__ import annotations

import duckdb
import pytest

from real_time_stock_market_data_pipeline__spark.operators.relational import (
    merge_upsert,
)
from real_time_stock_market_data_pipeline__spark.session import s3a_conf_from_env
from real_time_stock_market_data_pipeline__spark.warehouse import staged_merge_sql

TARGET = [
    ("AAPL", "2024-01-01", 190.5, 100),
    ("AAPL", "2024-01-02", 191.0, 110),
    ("MSFT", "2024-01-01", 370.1, 90),
]
BATCH = [
    ("AAPL", "2024-01-02", 200.0, 999),  # update
    ("NVDA", "2024-01-01", 550.0, 50),  # insert
]
COLS = ["symbol", "date", "close", "volume"]
KEYS = ["symbol", "date"]


def _run_staged_merge(con: duckdb.DuckDBPyConnection) -> list[tuple]:
    sql = staged_merge_sql(
        "target", KEYS, COLS, dialect="duckdb", placeholder="?"
    )
    con.execute(sql["create_stage"])
    con.executemany(sql["insert"], BATCH)
    for stmt in sql["merge"]:
        con.execute(stmt)
    return con.execute("SELECT * FROM target ORDER BY symbol, date").fetchall()


def test_staged_merge_sql_equals_engine_merge_upsert(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE target(symbol VARCHAR, date VARCHAR, close DOUBLE, volume BIGINT)")
    con.executemany("INSERT INTO target VALUES (?, ?, ?, ?)", TARGET)
    wire_result = _run_staged_merge(con)

    schema = "symbol string, date string, close double, volume long"
    engine_result = sorted(
        map(
            tuple,
            merge_upsert(
                spark.createDataFrame(TARGET, schema),
                spark.createDataFrame(BATCH, schema),
                KEYS,
            ).collect(),
        )
    )
    assert wire_result == engine_result

    # idempotence: folding the identical stage again is a no-op —
    # the property the reference's MERGE key guarantees
    sql = staged_merge_sql("target", KEYS, COLS, dialect="duckdb", placeholder="?")
    for stmt in sql["merge"]:
        con.execute(stmt)
    again = con.execute("SELECT * FROM target ORDER BY symbol, date").fetchall()
    assert again == wire_result


def test_staged_merge_ansi_shape():
    sql = staged_merge_sql("PRICES", KEYS, COLS)
    assert "LIKE PRICES" in sql["create_stage"]
    assert sql["insert"].count("%s") == len(COLS)
    (merge,) = sql["merge"]
    assert "MERGE INTO PRICES AS target" in merge
    assert "WHEN MATCHED THEN UPDATE SET" in merge
    assert "WHEN NOT MATCHED THEN" in merge
    assert "target.symbol = source.symbol AND target.date = source.date" in merge
    # keys are matched on, never updated
    assert "target.symbol = source.symbol," not in merge
    for c in COLS:
        assert f"source.{c}" in merge


@pytest.mark.parametrize(
    "kwargs",
    [
        {"keys": []},
        {"keys": ["nope"]},
        {"cols": ["symbol", "date"]},  # no non-key columns
        {"table": "bad-name; DROP"},
        {"dialect": "oracle"},
    ],
)
def test_staged_merge_rejects_bad_specs(kwargs):
    spec = {"table": "t", "keys": KEYS, "cols": COLS}
    spec.update(kwargs)
    with pytest.raises(ValueError):
        staged_merge_sql(**spec)


def test_s3a_profile_inactive_without_endpoint():
    assert s3a_conf_from_env({}) == {}


def test_s3a_profile_from_env():
    conf = s3a_conf_from_env(
        {
            "SPARK_GRAFT_S3_ENDPOINT": "http://minio:9000",
            "SPARK_GRAFT_S3_ACCESS_KEY": "ak",
            "SPARK_GRAFT_S3_SECRET_KEY": "sk",
        }
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert "SimpleAWSCredentialsProvider" in conf[
        "spark.hadoop.fs.s3a.aws.credentials.provider"
    ]
    # without explicit keys the default provider chain must stay in play
    chainless = s3a_conf_from_env({"SPARK_GRAFT_S3_ENDPOINT": "http://minio:9000"})
    assert "spark.hadoop.fs.s3a.access.key" not in chainless
    assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in chainless
