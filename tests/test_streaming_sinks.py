"""Streaming pipeline and sink tests (SURVEY.md §5 item 2): the
streamed dual-window metrics must equal the batch transform on the same
fixture; the incremental path must upsert, not duplicate; sinks must
round-trip."""

from __future__ import annotations

import pytest

import os
import tempfile

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark import sinks
from real_time_stock_market_data_pipeline__spark.operators.metrics import (
    realtime_metrics,
)
from real_time_stock_market_data_pipeline__spark.oracle_compare import value_hash
from real_time_stock_market_data_pipeline__spark.sources.registry import (
    load_table,
    read_partitioned,
)
from real_time_stock_market_data_pipeline__spark.streaming import pipeline


def _hash_df(df):
    return value_hash(df.columns, [tuple(r) for r in df.collect()])


OUT_COLS = [
    "symbol",
    "window_start",
    "window_15m_end",
    "window_1h_end",
    "moving_avg_price_15m",
    "moving_avg_price_1h",
    "price_volatility_15m",
    "price_volatility_1h",
    "total_volume_15m",
    "total_volume_1h",
]


def test_streamed_equals_batch(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="rtsmdp_t_")
    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    q = pipeline.stream_realtime_metrics(
        src,
        target_path=f"{tmp}/m",
        checkpoint_path=f"{tmp}/c",
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
        available_now=True,
    )
    q.awaitTermination()
    streamed = spark.read.parquet(f"{tmp}/m").select(*OUT_COLS)
    batch = realtime_metrics(
        load_table(spark, sf_dir, "events"),
        symbol_col="event_type",
        ts_col="ts",
        price_col="value",
    ).select(*OUT_COLS)
    assert _hash_df(streamed) == _hash_df(batch)


def test_streaming_restart_is_idempotent(spark, sf_dir):
    """Re-running the drained stream (fresh checkpoint, same input)
    must leave the target unchanged — the T10 idempotence property the
    reference gets from its MERGE key."""
    tmp = tempfile.mkdtemp(prefix="rtsmdp_t_")

    def run(ckpt: str) -> None:
        src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
        q = pipeline.stream_realtime_metrics(
            src,
            target_path=f"{tmp}/m",
            checkpoint_path=f"{tmp}/{ckpt}",
            symbol_col="event_type",
            ts_col="ts",
            price_col="value",
            available_now=True,
        )
        q.awaitTermination()

    run("c1")
    h1 = _hash_df(spark.read.parquet(f"{tmp}/m"))
    run("c2")
    h2 = _hash_df(spark.read.parquet(f"{tmp}/m"))
    assert h1 == h2


def test_rocksdb_state_store_matches_default(spark, sf_dir):
    """The RocksDB provider is a state-*storage* swap: a stateful
    streaming aggregation must produce byte-identical results under
    either provider (and actually run with RocksDB — this executes the
    query, it doesn't just set the conf)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    default_provider = spark.conf.get(key)

    def run(out_dir: str) -> None:
        src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
        q = pipeline.stream_window_metrics_append(
            src,
            target_path=f"{out_dir}/m",
            checkpoint_path=f"{out_dir}/c",
            symbol_col="event_type",
            ts_col="ts",
            price_col="value",
            available_now=True,
        )
        q.awaitTermination()

    tmp = tempfile.mkdtemp(prefix="rtsmdp_rocks_")
    try:
        pipeline.with_rocksdb_state(spark)
        run(f"{tmp}/rocks")
        spark.conf.set(key, default_provider)
        run(f"{tmp}/heap")
    finally:
        spark.conf.set(key, default_provider)
    rocks = spark.read.parquet(f"{tmp}/rocks/m")
    heap = spark.read.parquet(f"{tmp}/heap/m")
    cols = sorted(rocks.columns)
    assert _hash_df(rocks.select(*cols)) == _hash_df(heap.select(*cols))


def test_merge_upsert_parquet_updates_keys(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="rtsmdp_t_")
    path = f"{tmp}/tbl"
    ev = load_table(spark, sf_dir, "events").limit(100)
    first = ev.filter(F.col("event_id") < 50)
    sinks.merge_upsert_parquet(spark, first, path, keys=["event_id"])
    assert spark.read.parquet(path).count() == first.count()
    updated = ev.filter(F.col("event_id") < 20).withColumn(
        "value", F.lit(-1.0)
    )
    sinks.merge_upsert_parquet(spark, updated, path, keys=["event_id"])
    out = spark.read.parquet(path)
    assert out.count() == first.count()
    assert out.filter(F.col("value") == -1.0).count() == updated.count()


def test_parquet_roundtrip_partition_pruning(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="rtsmdp_t_")
    path = f"{tmp}/part"
    ev = load_table(spark, sf_dir, "events").limit(300)
    enriched = ev.select(
        "*",
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
    )
    sinks.write_parquet_partitioned(
        enriched, path, partition_cols=["year", "month", "day"]
    )
    pruned = read_partitioned(spark, path, year=2024, month=1, day=2)
    assert 0 < pruned.count() < spark.read.parquet(path).count()


def test_csv_roundtrip(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="rtsmdp_t_")
    path = f"{tmp}/csv"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).limit(50)
    sinks.write_csv_partitioned(ev, path, partition_cols=["event_type"])
    back = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .csv(path)
    )
    assert back.count() == 50
    assert set(back.columns) == {"event_id", "value", "event_type"}


def test_kafka_writer_shapes_keyed_json(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(5)
    writer = sinks.kafka_writer(ev, "localhost:9092", "ticks", key_col="event_type")
    # the configured writer's underlying frame must be (key, value) JSON
    rows = sinks.encode_keyed_json(ev, "event_type").collect()
    assert all(r["value"].startswith("{") and '"event_id"' in r["value"] for r in rows)
    assert writer is not None


def test_kafka_codec_roundtrip_is_lossless(spark, sf_dir):
    """decode_keyed_json must exactly invert encode_keyed_json — the
    producer wire shape and the consumer decode the Kafka source
    applies, minus the broker. Micro-precision timestamps and doubles
    must survive the JSON hop bit-for-bit."""
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ev = load_table(spark, sf_dir, "events").limit(200)
    wire = sinks.encode_keyed_json(ev, key_col="event_type")
    back = pipeline.decode_keyed_json(wire, ev.schema)
    assert back.columns == ["symbol_key"] + ev.columns
    orig = sorted(map(tuple, ev.collect()))
    got = sorted(r[1:] for r in map(tuple, back.collect()))
    assert got == orig


def test_merge_upsert_parquet_recovers_from_crashed_swap(spark, sf_dir):
    """A crash between the two swap renames leaves data only at
    path + '.old'; the next merge_upsert_parquet call must recover it
    before merging (single-writer self-healing)."""
    import os

    tmp = tempfile.mkdtemp(prefix="rtsmdp_t_")
    path = f"{tmp}/tbl"
    ev = load_table(spark, sf_dir, "events").limit(100)
    first = ev.filter(F.col("event_id") < 50)
    sinks.merge_upsert_parquet(spark, first, path, keys=["event_id"])
    # simulate the crash window: table dir gone, data stranded at .old
    os.rename(path, path + ".old")
    updated = ev.filter(F.col("event_id") < 20).withColumn("value", F.lit(-1.0))
    sinks.merge_upsert_parquet(spark, updated, path, keys=["event_id"])
    out = spark.read.parquet(path)
    assert out.count() == first.count()  # recovered rows survived
    assert out.filter(F.col("value") == -1.0).count() == updated.count()
    assert not os.path.exists(path + ".old")


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window streaming sessions == batch sessionize on
    the same drained fixture: same (key, session_start, n_events)
    rows. (Bounds close at last+gap in streaming by definition, so
    ends are not compared.)"""
    from real_time_stock_market_data_pipeline__spark.operators import temporal

    src = pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        pipeline.stream_sessionize(src, "user_id", "ts", gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "m"))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(str(tmp_path / "m")).select(
        "key", "session_start", "n_events"
    )
    ev = load_table(spark, sf_dir, "events")
    batch = temporal.sessionize(ev, "user_id", "ts", "event_id", 1800).select(
        "key", "session_start", "n_events"
    )
    # append mode withholds sessions still open at end-of-input (the
    # watermark never passes them): streamed ⊆ batch, and every
    # emitted session matches the batch row exactly
    srows = sorted(map(tuple, streamed.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert set(srows) <= set(brows)
    assert len(srows) >= 0.9 * len(brows)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts
    must join without any Exchange — the write-time shuffle replaces
    the query-time one."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        sinks.write_bucketed(li, "bkt_lineitem", ["l_orderkey"], 4, ["l_orderkey"])
        sinks.write_bucketed(orders, "bkt_orders", ["o_orderkey"], 4, ["o_orderkey"])
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_lineitem").join(
            spark.table("bkt_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and the co-located join is still the correct join
        assert joined.count() == li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_input_ready_gate(spark, sf_dir, tmp_path):
    assert sinks.input_ready(spark, f"{sf_dir}/events.parquet")
    assert not sinks.input_ready(spark, str(tmp_path / "nope"))


def test_rate_source_builds(spark):
    df = pipeline.read_rate_stream(spark)
    assert df.isStreaming
    assert set(df.columns) == {"ts", "symbol", "price", "volume"}


def test_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join drained with availableNow == the
    same interval join on the static frames (inner join, both sides
    complete at drain)."""
    def src():
        return pipeline.read_file_stream(spark, f"{sf_dir}/events.parquet")

    left = src().select(
        F.col("event_type"), F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    right = src().select(
        F.col("event_type"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    joined = pipeline.stream_interval_join(
        left, right, "event_type", "l_ts", "r_ts", lower_s=0, upper_s=30
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "m"))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(str(tmp_path / "m"))
    ev = load_table(spark, sf_dir, "events")
    bl = ev.select("event_type", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id"))
    br = ev.select(
        F.col("event_type").alias("rk"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    batch = bl.join(
        br,
        (F.col("event_type") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 SECONDS")),
    ).drop("rk")
    cols = sorted(streamed.columns)
    assert sorted(map(tuple, streamed.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )


def test_compact_parquet_preserves_rows_and_shrinks_files(spark, tmp_path):
    import glob

    from real_time_stock_market_data_pipeline__spark import sinks

    dest = str(tmp_path / "frag")
    # fragment: 24 tiny files
    spark.range(0, 2400).repartition(24).write.parquet(dest)
    before = len(glob.glob(f"{dest}/*.parquet"))
    assert before >= 24
    report = sinks.compact_parquet(spark, dest, target_file_bytes=10**9)
    assert report["files_before"] == before
    assert report["files_after"] == 1
    assert report["rows"] == 2400
    assert spark.read.parquet(dest).count() == 2400
    # ids survive exactly
    got = {r.id for r in spark.read.parquet(dest).collect()}
    assert got == set(range(2400))


def test_stream_rate_alert_only_breaches(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_stream_rate_alert,
    )

    rows = q_stream_rate_alert(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_events > 3
        assert r.severity > 1.0
        assert (r.window_end - r.window_start).total_seconds() == 6 * 3600


def test_merge_upsert_parquet_partitioned_touches_only_batch_cells(
    spark, tmp_path
):
    """Partition-scoped upsert (round-9 ADVICE): merging a batch that
    touches one cell must not rewrite the other cells' files; merge
    semantics on the key hold; replaying the same batch is a no-op
    (idempotence under checkpoint replay)."""
    import glob
    import os

    from real_time_stock_market_data_pipeline__spark import sinks

    path = str(tmp_path / "idx")
    first = spark.createDataFrame(
        [(1, 0, 0.9), (2, 0, 0.8), (3, 1, 0.7), (4, 2, 0.6)],
        "vec_id: long, cell: int, centroid_sim: double",
    )
    sinks.merge_upsert_parquet_partitioned(
        spark, first, path, keys=["vec_id"], partition_col="cell"
    )
    assert sorted(
        tuple(r) for r in spark.read.parquet(path)
        .select("vec_id", "cell", "centroid_sim").collect()
    ) == [(1, 0, 0.9), (2, 0, 0.8), (3, 1, 0.7), (4, 2, 0.6)]

    untouched_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/cell=1/*.parquet")
        + glob.glob(f"{path}/cell=2/*.parquet")
    }
    assert untouched_files

    # batch 2: update id=2 (cell 0), insert id=5 (cell 0)
    second = spark.createDataFrame(
        [(2, 0, 0.85), (5, 0, 0.5)],
        "vec_id: long, cell: int, centroid_sim: double",
    )
    sinks.merge_upsert_parquet_partitioned(
        spark, second, path, keys=["vec_id"], partition_col="cell"
    )
    got = sorted(
        tuple(r) for r in spark.read.parquet(path)
        .select("vec_id", "cell", "centroid_sim").collect()
    )
    assert got == [
        (1, 0, 0.9), (2, 0, 0.85), (3, 1, 0.7), (4, 2, 0.6), (5, 0, 0.5)
    ]
    # cells 1 and 2 were never rewritten
    for f, mtime in untouched_files.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mtime

    # replay (crash-restart): same batch again -> identical state
    sinks.merge_upsert_parquet_partitioned(
        spark, second, path, keys=["vec_id"], partition_col="cell"
    )
    again = sorted(
        tuple(r) for r in spark.read.parquet(path)
        .select("vec_id", "cell", "centroid_sim").collect()
    )
    assert again == got

    # empty batch: no-op, files untouched
    sinks.merge_upsert_parquet_partitioned(
        spark, first.limit(0), path, keys=["vec_id"], partition_col="cell"
    )
    assert spark.read.parquet(path).count() == 5


# ---------------------------------------------------------------------------
# Round-15 layout migration: NEW side tables use bp=<batch_id> appends;
# PRE-EXISTING tables must keep the layout they were created with
# (partition depth cannot change mid-table, and a legacy flat log must
# not crash on a missing partition column — round-14 ADVICE).
# ---------------------------------------------------------------------------


def _rewrite_json(path, obj):
    import json

    with open(path, "w") as f:
        json.dump(obj, f)


@pytest.mark.slow
def test_stream_neardup_legacy_layouts_merge(spark, tmp_path):
    """A pre-bp verdict log (flat, and round-14 vb-bucketed) plus a
    pfx-only band index keep MERGing under the migrated service: the
    layout is detected from the stored schema at wiring time and the
    final verdicts equal the batch screen either way."""
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    schema = "doc_id: long, text: string"
    corpus = spark.createDataFrame([(0, "c1 c2 c3 c4 c5")], schema)
    b1 = spark.createDataFrame(
        [(10, "c1 c2 c3 c4 c5"), (11, "n1 n2 n3 n4 n5")], schema
    )
    b2 = spark.createDataFrame([(20, "n1 n2 n3 n4 n5")], schema)
    cbp = str(tmp_path / "corpus_bands")
    dedup.write_dedup_index(corpus, cbp)
    want = {
        r["doc_id"]: (r["n_corpus_dups"], r["n_prior_dups"], r["dup"])
        for r in dedup.neardup_screen(b1.unionByName(b2), corpus).collect()
    }

    for layout in ("flat", "vb"):
        base = tmp_path / f"legacy_{layout}"
        out, sbp = str(base / "verdicts"), str(base / "stream_bands")
        in_dir, ckpt = str(base / "in"), str(base / "ckpt")
        # fabricate the pre-migration state after batch 1: verdict log
        # without a bp column (optionally vb-bucketed), band index
        # partitioned on pfx only
        v1 = dedup.neardup_screen(b1, corpus)
        if layout == "vb":
            (
                v1.withColumn(
                    "vb", sinks.id_hash_bucket(F.col("doc_id"), salt="ndv:")
                )
                .repartition(F.col("vb"))
                .write.partitionBy("vb")
                .parquet(out)
            )
        else:
            v1.write.parquet(out)
        (
            dedup.minhash_bands(b1)
            .withColumn(
                "pfx", F.concat(F.lit("p"), F.substring("band_hash", 1, 2))
            )
            .repartition(F.col("pfx"))
            .write.partitionBy("pfx")
            .parquet(sbp)
        )
        b2.coalesce(1).write.parquet(in_dir)
        src = pipeline.read_file_stream(spark, in_dir, schema=b2.schema)
        q = pipeline.stream_neardup_ingest(src, cbp, sbp, out, ckpt)
        q.awaitTermination()
        got = {
            r["doc_id"]: (r["n_corpus_dups"], r["n_prior_dups"], r["dup"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == want, layout
        # the legacy band table grew IN PLACE (no bp column appeared)
        bcols = spark.read.parquet(sbp).columns
        assert "bp" not in bcols
        assert {
            (r["doc_id"], r["band_idx"], r["band_hash"])
            for r in spark.read.parquet(sbp)
            .select("doc_id", "band_idx", "band_hash")
            .collect()
        } == {
            tuple(r) for r in dedup.minhash_bands(b1.unionByName(b2)).collect()
        }


@pytest.mark.slow
def test_stream_bm25_legacy_layouts_merge(spark, tmp_path):
    """Round-14 bucketed (dl_buckets/stat_buckets) and pre-13 flat
    doclens/stats sidecars keep their MERGE paths under the migrated
    ingest; the probe equals the one-pass scorer over the union."""
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    schema = "doc_id: long, text: string"
    corpus = spark.createDataFrame(
        [(0, "apple pie with extra apple"), (1, "pear tart no fruit")], schema
    )
    batch = spark.createDataFrame([(10, "apple and pear salad")], schema)
    terms = ["apple", "pear"]
    want = [
        tuple(r)
        for r in t.bm25_topk(corpus.unionByName(batch), terms, k=10).collect()
    ]

    for layout in ("bucketed", "flat"):
        idx = str(tmp_path / f"bm25_{layout}")
        in_dir = str(tmp_path / f"in_{layout}")
        ckpt = str(tmp_path / f"ckpt_{layout}")
        t.bm25_write_index(corpus, idx)
        # rewrite doclens/stats + sidecar into the legacy layout
        dls = t.bm25_doclens(corpus, "doc_id", "text")
        stats = dls.agg(
            F.lit(-1).cast("long").alias("batch_id"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        )
        import shutil as _sh

        _sh.rmtree(os.path.join(idx, "doclens"))
        _sh.rmtree(os.path.join(idx, "stats"))
        meta = {"n_buckets": t.BM25_TERM_BUCKETS, "id_col": "doc_id"}
        if layout == "bucketed":
            (
                dls.withColumn(
                    "dl_bucket",
                    sinks.id_hash_bucket(F.col("doc_id"), 8, salt="bm25dl:"),
                )
                .write.partitionBy("dl_bucket")
                .parquet(os.path.join(idx, "doclens"))
            )
            (
                stats.withColumn(
                    "stat_bucket",
                    F.pmod(F.col("batch_id"), F.lit(8)).cast("int"),
                )
                .write.partitionBy("stat_bucket")
                .parquet(os.path.join(idx, "stats"))
            )
            meta.update({"dl_buckets": 8, "stat_buckets": 8})
        else:
            dls.write.parquet(os.path.join(idx, "doclens"))
            stats.write.parquet(os.path.join(idx, "stats"))
        _rewrite_json(os.path.join(idx, t._BM25_META_SIDECAR), meta)

        batch.coalesce(1).write.parquet(in_dir)
        src = pipeline.read_file_stream(spark, in_dir, schema=batch.schema)
        q = pipeline.stream_bm25_ingest(src, idx, ckpt)
        q.awaitTermination()
        got = [
            tuple(r)
            for r in t.bm25_topk_indexed(spark, idx, terms, k=10).collect()
        ]
        assert got == want, layout
        assert "bp" not in spark.read.parquet(
            os.path.join(idx, "doclens")
        ).columns


@pytest.mark.slow
def test_stream_bq_legacy_layouts_merge(spark, sf_dir, tmp_path):
    """Round-14 sig_bucket-MERGE and pre-13 flat signature tables keep
    working under the migrated bq ingest (sidecar without `layout`);
    the probe equals bq_topk over the union with the frozen means."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    q_vec = [
        float(x) for x in embs.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    mu = similarity.bq_dim_means(embs)
    n = embs.count()
    half_a = embs.filter(F.col("vec_id") < n // 2)
    half_b = embs.filter(F.col("vec_id") >= n // 2)
    want = [
        tuple(r) for r in similarity.bq_topk(embs, q_vec, k=10, means=mu).collect()
    ]

    for layout in ("bucketed", "flat"):
        path = str(tmp_path / f"bq_{layout}" / "index")
        in_dir = str(tmp_path / f"in_{layout}")
        ckpt = str(tmp_path / f"ckpt_{layout}")
        lanes = similarity._bq_lane_cols("embedding", mu, len(mu))
        sig = half_a.select(
            F.col("vec_id"),
            *[ln.alias(f"sig{i}") for i, ln in enumerate(lanes)],
        )
        meta = {"means": mu, "id_col": "vec_id"}
        if layout == "bucketed":
            (
                sig.withColumn(
                    "sig_bucket",
                    sinks.id_hash_bucket(F.col("vec_id"), 8, salt="bq:"),
                )
                .repartition(F.col("sig_bucket"))
                .write.partitionBy("sig_bucket")
                .parquet(path)
            )
            meta["n_buckets"] = 8
        else:
            sig.write.parquet(path)
        _rewrite_json(similarity._bq_meta_path(path), meta)

        half_b.coalesce(1).write.parquet(in_dir)
        src = pipeline.read_file_stream(spark, in_dir)
        q = pipeline.stream_bq_ingest(src, path, ckpt)
        q.awaitTermination()
        got = [
            tuple(r)
            for r in similarity.bq_topk_indexed(
                spark, embs, path, q_vec, k=10
            ).collect()
        ]
        assert got == want, layout
        assert "bp" not in spark.read.parquet(path).columns


def test_stream_contrastive_legacy_cell_merge(spark, sf_dir, tmp_path):
    """A round-14 cell-only contrastive index (sidecar without
    `layout`) keeps the cell-scoped MERGE under the migrated ingest;
    the probe equals the batch miner over the union."""
    import json

    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings").withColumn(
        "label", (F.col("vec_id") % 3).cast("int")
    )
    n = embs.count()
    half_a = embs.filter(F.col("vec_id") < n // 2)
    half_b = embs.filter(F.col("vec_id") >= n // 2)
    cents = similarity.ivf_centroids(embs, 8)
    path = str(tmp_path / "contrastive_legacy")
    # fabricate the round-14 layout: cell partitions only, no bp
    (
        half_a.select(
            "vec_id",
            "label",
            "embedding",
            similarity.ivf_assign(F.col("embedding"), cents).alias("cell"),
        )
        .repartition(F.col("cell"))
        .write.partitionBy("cell")
        .parquet(path)
    )
    with open(similarity._contrastive_meta_path(path), "w") as f:
        json.dump(
            {
                "centroids": cents,
                "id_col": "vec_id",
                "label_col": "label",
                "vec_col": "embedding",
            },
            f,
        )
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    half_b.coalesce(1).write.parquet(in_dir)
    src = pipeline.read_file_stream(spark, in_dir)
    q = pipeline.stream_contrastive_ingest(src, path, ckpt)
    q.awaitTermination()
    assert "bp" not in spark.read.parquet(path).columns
    anchors = embs.filter(F.col("vec_id") < 4)
    got = similarity.contrastive_pairs_indexed(spark, anchors, path, k=3)
    want = similarity.contrastive_pairs(embs, anchors, k=3, centroids=cents)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_compact_batch_partitions_flat_and_replay_safety(spark, tmp_path):
    """Flat bp table: folding the committed prefix consolidates into
    bp=-1, keeps newer partitions byte-identical, preserves rows, and
    a replay of an UNfolded batch stays idempotent (overwrites its
    own partition) — the invariant upto_bp exists to protect."""
    path = str(tmp_path / "t")
    base = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.lit(-1).cast("long").alias("bp"),
    )
    base.write.partitionBy("bp").parquet(path)
    for b in range(4):
        sinks.append_batch_partition(
            spark.range(100 * (b + 1) + 1000, 100 * (b + 1) + 1010).select(
                F.col("id"), (F.col("id") * 2).alias("v"),
                F.lit(b).cast("long").alias("bp"),
            ),
            path,
            ["bp"],
        )
    before = sorted(tuple(r) for r in spark.read.parquet(path).drop("bp").collect())
    rep = sinks.compact_batch_partitions(spark, path, upto_bp=2)
    assert rep and rep[os.path.basename(path)]["bp_dirs_after"] == 2
    dirs = sorted(
        e for e in os.listdir(path) if e.startswith("bp=")
    )
    assert dirs == ["bp=-1", "bp=3"]
    assert sorted(
        tuple(r) for r in spark.read.parquet(path).drop("bp").collect()
    ) == before
    # replay of the unfolded batch 3: same rows land in bp=3 again —
    # total unchanged (idempotent by layout)
    sinks.append_batch_partition(
        spark.range(1400, 1410).select(
            F.col("id"), (F.col("id") * 2).alias("v"),
            F.lit(3).cast("long").alias("bp"),
        ),
        path,
        ["bp"],
    )
    assert sorted(
        tuple(r) for r in spark.read.parquet(path).drop("bp").collect()
    ) == before
    # second compaction with nothing new to fold: no-op
    assert sinks.compact_batch_partitions(spark, path, upto_bp=2) == {}


def test_compact_batch_partitions_nested_and_heal(spark, tmp_path):
    """Nested cell=*/bp=* layout: each prune directory compacts
    independently, the prune key keeps working, and an interrupted
    swap (orphaned .old directory) self-heals on the next call."""
    import shutil as _sh

    path = str(tmp_path / "t")
    for b in (-1, 0, 1):
        sinks.append_batch_partition(
            spark.range(20).select(
                F.col("id"),
                (F.col("id") % 4).cast("int").alias("cell"),
                F.lit(b).cast("long").alias("bp"),
            ),
            path,
            ["cell", "bp"],
            coherence_col="cell",
        )
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("bp").collect()
    )
    rep = sinks.compact_batch_partitions(spark, path, upto_bp=1, prune_col="cell")
    assert len(rep) == 4  # every cell had 3 bp dirs
    for cd in os.listdir(path):
        if cd.startswith("cell="):
            assert sorted(os.listdir(os.path.join(path, cd))) == ["bp=-1"]
    after = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("bp").collect()
    )
    assert after == before
    # pruning still works on the consolidated layout
    assert (
        spark.read.parquet(path).filter(F.col("cell") == 2).count()
        == sum(1 for r in before if r[1] == 2)
    )
    # heal: orphan one cell directory as .old (crash between renames)
    victim = os.path.join(path, "cell=2")
    os.rename(victim, victim + ".old")
    sinks.compact_batch_partitions(spark, path, upto_bp=1, prune_col="cell")
    assert os.path.isdir(victim) and not os.path.isdir(victim + ".old")
    assert sorted(
        tuple(r) for r in spark.read.parquet(path).drop("bp").collect()
    ) == before


@pytest.mark.slow
def test_stream_semantic_screen_legacy_cell_merge(spark, tmp_path):
    """A pre-bp semantic index (cell partitions only) keeps the
    round-9 cell-scoped MERGE under the migrated screen: layout is
    detected from the stored schema at wiring, sequential-ingest
    results are unchanged, and no bp column appears."""
    schema = "vec_id: long, embedding: array<float>"
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])], schema
    )
    idx = str(tmp_path / "index")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    # fabricate the legacy state after a first drain that kept row 3:
    # the index is the _semantic_assign shape partitioned on cell only
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    kept1 = spark.createDataFrame([(3, [0.0, 0.1, 0.9, 0.0])], schema)
    (
        similarity._semantic_assign(kept1, cents, "embedding", "vec_id")
        .repartition(F.col("cell"))
        .write.partitionBy("cell")
        .parquet(idx)
    )
    # drain 2: row 5 duplicates KEPT row 3 (killed by the index), row
    # 6 is novel (kept)
    spark.createDataFrame(
        [(5, [0.0, 0.12, 0.89, 0.0]), (6, [0.0, 0.0, 0.0, 1.0])], schema
    ).coalesce(1).write.parquet(in_dir)
    src = pipeline.read_file_stream(
        spark, in_dir, schema=spark.createDataFrame([], schema).schema
    )
    q = pipeline.stream_semantic_screen(
        src, corpus, idx, ckpt, threshold=0.9, centroids=cents,
    )
    q.awaitTermination()
    assert "bp" not in spark.read.parquet(idx).columns
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(idx).collect()
    ) == [3, 6]


@pytest.mark.slow
def test_stream_substring_legacy_layouts_merge(spark, tmp_path):
    """A pre-bp ExactSubstr state — pfx-only block index, flat
    rewritten-docs table — keeps MERGing under the migrated service:
    layouts are detected from the stored schemas at wiring and the
    final state equals the bp-layout run on the same drains."""
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    schema = "doc_id: long, text: string"
    corpus = spark.createDataFrame(
        [(0, "c1 c2 c3 c4 c5 c6 c7 c8")], schema
    )
    b1 = spark.createDataFrame(
        [(10, "n1 n2 n3 n4 n5 n6 n7 n8")], schema
    )
    b2 = spark.createDataFrame(
        [(20, "n1 n2 n3 n4 n5 n6 n7 n8 m1 m2 m3 m4 m5 m6 m7 m8")], schema
    )
    idx = str(tmp_path / "blockidx")
    out = str(tmp_path / "rewritten")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    # fabricate the legacy post-b1 state: strip bp from a fresh build
    # of corpus ∪ b1 digests (pfx-only), docs table flat
    dedup.write_block_index(corpus.unionByName(b1), idx + "_new",
                            partitioned=True)
    (
        spark.read.parquet(idx + "_new")
        .select("block_md5", "first_id", "first_pos", "pfx")
        .repartition(F.col("pfx"))
        .write.partitionBy("pfx")
        .parquet(idx)
    )
    # b1's rewritten row as the pre-existing flat docs table: screen
    # b1 against the corpus-only digest slice (first_id 0 = corpus)
    flagged1 = dedup._substring_screen(
        b1,
        spark.read.parquet(idx).filter(F.col("first_id") == 0),
        "doc_id", "text", 8,
    )
    dedup._rebuild_docs(flagged1, "doc_id", emit_text=True).write.parquet(out)
    b2.coalesce(1).write.parquet(in_dir)
    src = pipeline.read_file_stream(spark, in_dir, schema=b1.schema)
    q = pipeline.stream_substring_ingest(src, idx, out, ckpt)
    q.awaitTermination()
    assert "bp" not in spark.read.parquet(out).columns
    assert "bp" not in spark.read.parquet(idx).columns
    docs = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"])
        for r in spark.read.parquet(out).collect()
    }
    # doc 20's first 8-word block duplicates stored doc 10; its second
    # is novel — 9 positions total, the duplicated prefix dropped
    assert set(docs) == {10, 20}
    assert docs[20][0] > docs[20][1] >= 1
    digs = sorted(
        r["block_md5"] for r in spark.read.parquet(idx).collect()
    )
    want = sorted(
        r["block_md5"]
        for r in spark.read.parquet(idx + "_new").select("block_md5")
        .union(
            dedup._doc_blocks(b2, "doc_id", "text", 8)
            .select(F.md5("block").alias("block_md5"))
        )
        .distinct()
        .collect()
    )
    assert digs == want
