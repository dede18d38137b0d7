"""Property tests (SURVEY.md §5 item 3): idempotence, additivity,
determinism, and physical-plan assertions for the scale-critical
operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import (
    dedup,
    ohlcv,
    relational,
)
from real_time_stock_market_data_pipeline__spark.oracle_compare import value_hash
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


def _hash_df(df):
    return value_hash(df.columns, [tuple(r) for r in df.collect()])


def test_merge_upsert_idempotent(spark, sf_dir):
    """Applying the same batch twice equals applying it once — the
    property the reference's warehouse MERGE guarantees (J2/J3)."""
    ev = load_table(spark, sf_dir, "events")
    target = ev.filter(F.col("event_id") % 2 == 0)
    source = ev.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") * 2
    )
    once = relational.merge_upsert(target, source, ["event_id"])
    twice = relational.merge_upsert(once, source, ["event_id"])
    assert _hash_df(once) == _hash_df(twice)


def test_merge_upsert_replaces_and_inserts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(100)
    target = ev.filter(F.col("event_id") < 50)
    source = ev.filter((F.col("event_id") >= 40) & (F.col("event_id") < 60))
    merged = relational.merge_upsert(target, source, ["event_id"])
    assert merged.count() == target.count() + source.filter(
        F.col("event_id") >= 50
    ).count()


def test_dedup_keep_last_idempotent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    once = dedup.dedup_keep_last(ev, ["user_id", "event_type"], ["ts", "event_id"])
    twice = dedup.dedup_keep_last(once, ["user_id", "event_type"], ["ts", "event_id"])
    assert _hash_df(once) == _hash_df(twice)


def test_dedup_exact_groups_cover_all_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    groups = dedup.dedup_exact(docs)
    total = groups.agg(F.sum("dup_count")).collect()[0][0]
    assert total == docs.count()


def test_daily_metrics_variants_agree(spark, sf_dir):
    """groupBy (min_by/max_by) form ≡ ordered-window form (W1–W5)."""
    ev = load_table(spark, sf_dir, "events")
    kw = dict(symbol_col="event_type", ts_col="ts", price_col="value", id_col="event_id")
    a = ohlcv.daily_metrics(ev, **kw)
    b = ohlcv.daily_metrics_window(ev, **kw)
    assert _hash_df(a) == _hash_df(b)


def test_daily_volume_additivity(spark, sf_dir):
    """Σ per-day volumes = total row count (A6/window additivity)."""
    ev = load_table(spark, sf_dir, "events")
    dm = ohlcv.daily_metrics(
        ev, symbol_col="event_type", ts_col="ts", price_col="value", id_col="event_id"
    )
    assert dm.agg(F.sum("daily_volume")).collect()[0][0] == ev.count()


def test_volume_sums_not_counts(spark, sf_dir):
    """The r02 regression: with a volume column, daily_volume must sum
    it, not count rows."""
    li = load_table(spark, sf_dir, "lineitem").limit(500)
    dm = ohlcv.daily_metrics(
        li,
        symbol_col="l_returnflag",
        ts_col="l_shipdate",
        price_col="l_extendedprice",
        volume_col="l_quantity",
    )
    total = dm.agg(F.sum("daily_volume")).collect()[0][0]
    expect = li.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("bigint")
    ).collect()[0][0]
    assert total == expect
    assert total != 500  # would equal the row count under the old bug


def test_minhash_join_is_not_cartesian(spark, sf_dir):
    """LSH candidate join must be key-bucketed — a cartesian product
    here is the 100 TB death sentence."""
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        dedup.dedup_minhash_pairs(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_identical_docs_are_candidates(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different words appear in this other document here")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.dedup_minhash_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_shingles_short_docs_safe(spark):
    """ANSI-mode regression: sub-k-word docs must yield empty shingles,
    not INVALID_ARRAY_INDEX errors, and must not become LSH candidates."""
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, ""), (4, "one")],
        ["doc_id", "text"],
    )
    assert dedup.dedup_minhash_pairs(docs).count() == 0
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.1)
    assert jac.count() == 0


def test_shingles_known_answers(spark):
    """Pins the round-17 slice+zip_with shingle formulation to the
    exact arrays the original transform/element_at form produced:
    positional order (first occurrence), duplicates collapsed,
    sub-k docs empty, multi-space normalization preserved."""
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c d"),
        (2, "a a a a"),          # duplicate shingles collapse
        (3, "x y"),              # sub-k → empty
        (4, ""),                 # empty → empty
        (5, "A  b\tC d"),        # normalization (case/whitespace)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", dedup.shingles("text", 3).alias("sh")
        ).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == ["a a a"]
    assert got[3] == []
    assert got[4] == []
    assert got[5] == ["a b c", "b c d"]
    got2 = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", dedup.shingles("text", 2).alias("sh")
        ).collect()
    }
    assert got2[1] == ["a b", "b c", "c d"]
    assert got2[2] == ["a a"]
    assert got2[3] == ["x y"]


def test_simhash_duplicate_docs_equal_hamming_zero(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    assert len(fp[1]) == 16


def test_asof_join_picks_latest_at_or_before(spark):
    from datetime import datetime

    left = spark.createDataFrame(
        [(1, "k", datetime(2024, 1, 1, 12, 0, 0)),
         (2, "k", datetime(2024, 1, 1, 10, 0, 0)),
         (3, "other", datetime(2024, 1, 1, 12, 0, 0))],
        ["id", "key", "ts"],
    )
    right = spark.createDataFrame(
        [("k", datetime(2024, 1, 1, 9, 0, 0), 1.0),
         ("k", datetime(2024, 1, 1, 11, 0, 0), 2.0),
         ("k", datetime(2024, 1, 1, 13, 0, 0), 3.0)],
        ["key", "rts", "val"],
    )
    out = {
        r["id"]: r["val"]
        for r in relational.asof_join(
            left, right, ["key"], "ts", "rts", ["val"]
        ).collect()
    }
    assert out == {1: 2.0, 2: 1.0, 3: None}


def test_topk_movers_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dm = ohlcv.daily_metrics(
        ev, symbol_col="event_type", ts_col="ts", price_col="value", id_col="event_id"
    )
    a = [tuple(r) for r in ohlcv.topk_movers(dm, 5).collect()]
    b = [tuple(r) for r in ohlcv.topk_movers(dm.repartition(13), 5).collect()]
    assert a == b


def test_round6_operators_partitioning_invariant(spark, sf_dir):
    """The round-6 exactness-critical operators must hash identically
    under different parallelism — the property the decimal/rank/digest
    recipes exist to guarantee."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        behavior,
        indicators,
        metrics,
        similarity,
        sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    embs = load_table(spark, sf_dir, "embeddings")
    daily = ohlcv.daily_metrics(
        ev, symbol_col="event_type", ts_col="ts",
        price_col="value", id_col="event_id",
    )

    cases = [
        lambda d: indicators.ohlc_volatility(d),
        lambda d: indicators.return_autocorr(d),
        lambda d: indicators.return_streaks(d),
        lambda d: indicators.heikin_ashi(d),
        lambda d: indicators.underwater_spells(d),
    ]
    for fn in cases:
        base = _hash_df(fn(daily.coalesce(1)))
        wide = _hash_df(fn(daily.repartition(13)))
        assert base == wide, fn

    assert _hash_df(
        metrics.mad_anomalies(
            ev.coalesce(1), ["event_type"], "value", ["event_id"]
        )
    ) == _hash_df(
        metrics.mad_anomalies(
            ev.repartition(17), ["event_type"], "value", ["event_id"]
        )
    )
    assert _hash_df(
        sketches.kmv_set_ops(ev.coalesce(1), "user_id", "event_type")
    ) == _hash_df(
        sketches.kmv_set_ops(ev.repartition(19), "user_id", "event_type")
    )
    assert _hash_df(
        similarity.embedding_quantize(embs.coalesce(1))
    ) == _hash_df(similarity.embedding_quantize(embs.repartition(7)))
    assert _hash_df(
        behavior.event_lift(ev.coalesce(1))
    ) == _hash_df(behavior.event_lift(ev.repartition(23)))


def test_incremental_neardup_finds_its_sources(spark, sf_dir):
    """A 'v2 '-prefixed copy shares all but the first shingle with its
    source, so every new doc must collide with its own original at
    high band strength."""
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new_batch = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("v2 "), F.col("text")).alias("text"),
    )
    out = dedup.incremental_neardup(new_batch, docs).collect()
    hits = {(r.new_id, r.corpus_id): r.shared_bands for r in out}
    eligible = [
        r.doc_id
        for r in docs.where(
            (F.col("doc_id") % 5 == 0)
        ).select("doc_id", F.split(F.col("text"), " ").alias("t")).collect()
        if len(r.t) >= 3
    ]
    found = sum(
        1 for d in eligible if (d + 1_000_000, d) in hits
    )
    # nearly every perturbed doc must hit its source (a one-token
    # prefix changes one shingle out of many)
    assert found >= 0.9 * len(eligible)
    for sb in hits.values():
        assert 1 <= sb <= 8


@pytest.mark.slow
def test_round7_operators_partitioning_invariant(spark, sf_dir):
    """Round-7 exactness-critical operators hash identically under
    different parallelism — the decimal/rank/quantizer recipes at
    work."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        behavior,
        indicators,
        metrics,
        similarity,
    )

    ev = load_table(spark, sf_dir, "events")
    embs = load_table(spark, sf_dir, "embeddings")
    daily = ohlcv.daily_metrics(
        ev, symbol_col="event_type", ts_col="ts",
        price_col="value", id_col="event_id",
    )

    daily_cases = [
        lambda d: indicators.williams_r(d, n=5),
        lambda d: indicators.mfi(d, n=5),
        lambda d: indicators.cmf(d, n=5),
        lambda d: indicators.aroon(d, n=5),
        lambda d: indicators.cci(d, n=5),
        lambda d: indicators.kaufman_er(d, n=5, close_col="daily_close"),
        lambda d: indicators.vortex(d, n=5),
        lambda d: indicators.pivot_points(d),
        lambda d: indicators.kama(d, n=5, close_col="daily_close"),
        lambda d: indicators.holt_linear(d, close_col="daily_close"),
        lambda d: metrics.rolling_median(
            d, "symbol", "date", "daily_close", n=5
        ),
    ]
    for fn in daily_cases:
        assert _hash_df(fn(daily.coalesce(1))) == _hash_df(
            fn(daily.repartition(13))
        ), fn

    ev_weekend = ev.withColumn(
        "is_weekend", F.dayofweek("ts").isin(1, 7).cast("int")
    )
    ev_cases = [
        lambda e: metrics.ks_drift(e, "event_type", "is_weekend", "value"),
        lambda e: metrics.psi_drift(e, "event_type", "is_weekend", "value"),
        lambda e: metrics.chi_square_independence(e, "event_type", "user_id"),
        lambda e: metrics.mann_whitney_u(e, "event_type", "is_weekend", "value"),
        lambda e: metrics.gini(e, "event_type", "value"),
        lambda e: behavior.churn_by_period(e, "week"),
        lambda e: behavior.event_pagerank(e, n_iter=3),
        lambda e: behavior.session_copresence_pmi(e),
    ]
    for fn in ev_cases:
        assert _hash_df(fn(ev_weekend.coalesce(1))) == _hash_df(
            fn(ev_weekend.repartition(17))
        ), fn

    emb_cases = [
        lambda m: similarity.random_projection(m, out_dim=8),
        lambda m: similarity.centroid_similarity(m),
    ]
    for fn in emb_cases:
        assert _hash_df(fn(embs.coalesce(1))) == _hash_df(
            fn(embs.repartition(7))
        ), fn
