"""The 100×-scale configuration profile (VERDICT r5 item 7): one
executable function instead of scattered notes, applied through the
normal session factory and verified to leave the plan invariants the
repo already asserts (broadcast of dims, parquet pushdown) intact."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark import session
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


def test_scale_profile_sizing_math():
    p = session.scale_profile(executors=1000, executor_cores=4)
    # shuffle partitions: 3× total cores
    assert p["spark.sql.shuffle.partitions"] == str(3 * 4000)
    # byte thresholds are exact integers (Spark accepts raw bytes)
    assert int(p["spark.sql.files.maxPartitionBytes"]) == 256 * 1024 * 1024
    assert int(p["spark.sql.autoBroadcastJoinThreshold"]) == 64 * 1024 * 1024
    assert (
        int(p["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"])
        == 2 * 128 * 1024 * 1024
    )
    # the profile carries the full engine conf + RocksDB state store
    for k, v in session.ENGINE_CONF.items():
        assert p[k] == v
    assert "RocksDBStateStoreProvider" in p[
        "spark.sql.streaming.stateStore.providerClass"
    ]
    # cluster shape scales the numbers
    small = session.scale_profile(executors=10, executor_cores=2)
    assert small["spark.sql.shuffle.partitions"] == "60"


def test_apply_scale_profile_live_and_restore(spark, sf_dir):
    prev = session.apply_scale_profile(spark, executors=10, executor_cores=2)
    try:
        assert spark.conf.get("spark.sql.shuffle.partitions") == "60"
        assert (
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            == str(64 * 1024 * 1024)
        )
        # plan invariants hold under the profile: a dim join still
        # broadcasts, filters still reach the parquet scan
        cust = load_table(spark, sf_dir, "customer")
        nation = load_table(spark, sf_dir, "nation")
        plan = (
            cust.join(nation, cust.c_nationkey == nation.n_nationkey)
            .filter(F.col("c_acctbal") > 0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "PushedFilters: [IsNotNull(c_acctbal)" in plan.replace(
            "PushedFilters: [IsNotNull(c_nationkey), IsNotNull(c_acctbal)",
            "PushedFilters: [IsNotNull(c_acctbal)",
        )
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)


def test_get_spark_applies_profile_conf(spark):
    """getOrCreate propagates runtime-modifiable builder conf onto the
    existing session, so `get_spark(extra_conf=scale_profile(...))` is
    the one-liner cluster entry point."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s2 = session.get_spark(
            extra_conf={"spark.sql.shuffle.partitions": "77"}
        )
        assert s2 is spark or s2.conf.get(
            "spark.sql.shuffle.partitions"
        ) == "77"
        assert spark.conf.get("spark.sql.shuffle.partitions") == "77"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
