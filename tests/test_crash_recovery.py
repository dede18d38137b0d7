"""Failure injection for `sinks.merge_upsert_parquet`'s read-merge-swap.

The reference's warehouse load guarantees exactly-once via an
idempotent keyed MERGE (`realtime_load_to_snowflake.py:225-251` —
re-running a batch cannot double-apply it). The parquet sink makes the
same promise under a single writer; these tests prove it holds not
just under re-run but under a CRASH at every window of the swap
protocol:

  stage:   write merged -> tmp dir
  swap A:  rename(path, path.old)        <- crash here: path absent
  swap B:  rename(tmp, path)             <- crash here: stale .old
  cleanup: rmtree(path.old)

Each test reconstructs the exact on-disk state a kill at that point
leaves behind, then calls merge_upsert_parquet again (the restart
re-delivering the SAME batch, which is what a checkpointed stream
does) and asserts the final table equals the exactly-once result.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from real_time_stock_market_data_pipeline__spark import sinks


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="crash_merge_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _initial(spark):
    return spark.createDataFrame(
        [("AAA", "2024-01-01", 10.0), ("BBB", "2024-01-01", 20.0)],
        "symbol string, date string, close double",
    )


def _batch(spark):
    # updates AAA, inserts CCC
    return spark.createDataFrame(
        [("AAA", "2024-01-01", 11.0), ("CCC", "2024-01-01", 30.0)],
        "symbol string, date string, close double",
    )


EXPECTED = {
    ("AAA", "2024-01-01", 11.0),
    ("BBB", "2024-01-01", 20.0),
    ("CCC", "2024-01-01", 30.0),
}


def _rows(spark, path):
    return {
        tuple(r) for r in spark.read.parquet(path).collect()
    }


def _seed(spark, workdir):
    path = os.path.join(workdir, "table")
    _initial(spark).write.parquet(path)
    return path


def test_rerun_same_batch_is_exactly_once(spark, workdir):
    path = _seed(spark, workdir)
    for _ in range(3):  # checkpoint re-delivery: N replays, one effect
        sinks.merge_upsert_parquet(
            spark, _batch(spark), path, keys=["symbol", "date"]
        )
        assert _rows(spark, path) == EXPECTED


def test_crash_after_stage_before_swap(spark, workdir):
    # kill between the staging write and swap A: target untouched, an
    # orphaned merge_upsert_* staging dir survives next to it
    path = _seed(spark, workdir)
    stray = tempfile.mkdtemp(prefix="merge_upsert_", dir=workdir)
    _batch(spark).write.mode("overwrite").parquet(stray)

    sinks.merge_upsert_parquet(
        spark, _batch(spark), path, keys=["symbol", "date"]
    )
    assert _rows(spark, path) == EXPECTED


def test_crash_mid_swap_recovers_old_state(spark, workdir):
    # kill between swap A and swap B: `path` is ABSENT, the pre-batch
    # state lives only at path.old (the documented worst window)
    path = _seed(spark, workdir)
    os.rename(path, path + ".old")
    assert not os.path.exists(path)

    sinks.merge_upsert_parquet(
        spark, _batch(spark), path, keys=["symbol", "date"]
    )
    assert _rows(spark, path) == EXPECTED
    assert not os.path.exists(path + ".old")


def test_crash_after_swap_before_cleanup(spark, workdir):
    # kill between swap B and cleanup: new state is live at `path`,
    # a stale .old lingers; the restart re-delivers the same batch
    path = _seed(spark, workdir)
    sinks.merge_upsert_parquet(
        spark, _batch(spark), path, keys=["symbol", "date"]
    )
    # manufacture the stale .old a crash would have left
    shutil.copytree(path, path + ".old")

    sinks.merge_upsert_parquet(
        spark, _batch(spark), path, keys=["symbol", "date"]
    )
    assert _rows(spark, path) == EXPECTED


def test_crash_mid_swap_then_different_later_batch(spark, workdir):
    # recovery must not resurrect rows a LATER batch supersedes: crash
    # mid-swap, then the restarted job applies batch1 (replay) and a
    # new batch2
    path = _seed(spark, workdir)
    os.rename(path, path + ".old")

    sinks.merge_upsert_parquet(
        spark, _batch(spark), path, keys=["symbol", "date"]
    )
    batch2 = spark.createDataFrame(
        [("CCC", "2024-01-01", 31.0)],
        "symbol string, date string, close double",
    )
    sinks.merge_upsert_parquet(spark, batch2, path, keys=["symbol", "date"])
    assert _rows(spark, path) == {
        ("AAA", "2024-01-01", 11.0),
        ("BBB", "2024-01-01", 20.0),
        ("CCC", "2024-01-01", 31.0),
    }
