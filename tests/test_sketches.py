"""Laws for the KMV sketch and the text repetition stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.driver_queries import (
    q_kmv_distinct,
    q_repetition_stats,
)
from real_time_stock_market_data_pipeline__spark.operators import sketches, text


def test_kmv_exact_below_k(spark):
    # fewer than k distinct keys → the sketch degrades to the exact count
    df = spark.range(40).select(
        F.lit("g").alias("grp"), F.col("id").alias("key")
    )
    row = sketches.kmv_distinct(df, "key", "grp", k=64).collect()[0]
    assert row.n_exact == 40
    assert row.n_est == 40.0
    assert row.rel_err == 0.0


def test_kmv_estimate_in_range(spark, sf_dir):
    rows = q_kmv_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_est > 0
        # k=64 KMV: standard error ~ 1/sqrt(k-2) ≈ 13%; allow 4 sigma
        assert r.rel_err < 0.52


def test_kmv_partitioning_invariant(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = sketches.kmv_distinct(ev, "user_id", "event_type", k=32)
    b = sketches.kmv_distinct(ev.repartition(13, "value"), "user_id", "event_type", k=32)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_repetition_bounds_and_pathological_doc(spark, sf_dir):
    rows = q_repetition_stats(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 < r.top_word_frac <= 1
        if r.top_bigram_frac is not None:
            assert 0 < r.top_bigram_frac <= 1
        if r.dup_5gram_frac is not None:
            assert 0 <= r.dup_5gram_frac <= 1
    # a fully repeated doc maxes every signal
    docs = spark.createDataFrame(
        [(1, "spam " * 20), (2, "all words here are different tokens now")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in text.repetition_stats(docs).collect()}
    assert out[1].top_word_frac == 1.0
    assert out[1].top_bigram_frac == 1.0
    assert out[1].dup_5gram_frac == 1.0
    assert out[2].top_word_frac == round(1 / 7, 6)
    assert out[2].dup_5gram_frac == 0.0
