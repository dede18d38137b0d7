"""Laws for the KMV sketch and the text repetition stats."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.driver_queries import (
    q_kmv_distinct,
    q_repetition_stats,
)
from real_time_stock_market_data_pipeline__spark.operators import sketches, text
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


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


def test_kmv_set_ops_pairs_estimates_and_identity(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_kmv_set_ops,
    )
    from real_time_stock_market_data_pipeline__spark.operators import sketches

    rows = q_kmv_set_ops(spark, sf_dir).collect()
    # 5 event types -> C(5,2) unordered pairs
    assert len(rows) == 10
    for r in rows:
        assert r.grp_a < r.grp_b
        assert 0 <= r.jaccard_est <= 1
        assert 0 <= r.jaccard_exact <= 1
        assert r.union_exact >= r.inter_exact
        assert r.union_est > 0
        # KMV union estimate: loose sanity envelope at k=64
        assert r.union_est == pytest.approx(r.union_exact, rel=0.5)
        assert r.jaccard_est == pytest.approx(r.jaccard_exact, abs=0.35)
    # identical sets -> union == set, jaccard == 1 (small set: k covers it)
    df = spark.createDataFrame(
        [(i, g) for i in range(40) for g in ("a", "b")], "k long, g string"
    )
    out = sketches.kmv_set_ops(df, key_col="k", group_col="g", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.union_exact == 40 and r.inter_exact == 40
    assert r.union_est == 40.0 and r.jaccard_est == 1.0
    # disjoint sets -> jaccard 0
    dj = spark.createDataFrame(
        [(i, "a") for i in range(40)] + [(i + 1000, "b") for i in range(40)],
        "k long, g string",
    )
    r2 = sketches.kmv_set_ops(dj, key_col="k", group_col="g", k=128).collect()[0]
    assert r2.inter_exact == 0 and r2.jaccard_est == 0.0
    assert r2.union_est == 80.0


def test_cms_one_sided_overestimate(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_cms_heavy_hitters,
    )

    rows = q_cms_heavy_hitters(spark, sf_dir).collect()
    # top_n=20, capped by the table's distinct-user cardinality
    assert 1 <= len(rows) <= 20
    for r in rows:
        # CMS can only overcount — the defining structural law
        assert r.n_est >= r.n_exact
        assert r.overcount == r.n_est - r.n_exact
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_cms_counters_merge_across_splits(spark, sf_dir):
    """Mergeable-summary law: the sketch counters of two disjoint
    splits ADD to the counters of the whole — the property that makes
    the build a partial aggregation at 100 TB."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    half_a = ev.where(F.col("event_id") % 2 == 0)
    half_b = ev.where(F.col("event_id") % 2 == 1)

    def counters(df):
        # rebuild just the sketch stage via the public operator's
        # internals: estimate for EVERY key with top_n >= all keys
        out = sketches.cms_heavy_hitters(
            df, "user_id", depth=2, width=64, top_n=10**9
        )
        return {r.key: r.n_exact for r in out.collect()}

    whole = counters(ev)
    a = counters(half_a)
    b = counters(half_b)
    for k, n in whole.items():
        assert a.get(k, 0) + b.get(k, 0) == n


def test_cms_small_width_still_bounds_error(spark):
    # width 4, many colliding keys: estimates stay >= exact and the
    # estimate of any key is bounded by the total stream length
    df = spark.range(1000).select((F.col("id") % 50).alias("k"))
    out = sketches.cms_heavy_hitters(df, "k", depth=3, width=4, top_n=50)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_exact == 20
        assert 20 <= r.n_est <= 1000


# ---------------------------------------------------------------------------
# Round-7: Bloom filter prefilter
# ---------------------------------------------------------------------------


def test_bloom_never_drops_a_member(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    keys = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    words = sketches.bloom_build(keys, "user_id")
    probed = sketches.bloom_probe(ev, words, "user_id")
    false_neg = (
        probed.join(keys, "user_id", "left_semi")
        .where(~F.col("bloom_pass"))
        .count()
    )
    assert false_neg == 0


def test_bloom_prefilter_audit_reconciles(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_bloom_prefilter,
    )

    rows = q_bloom_prefilter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # no false negatives => everything the bloom passed beyond the
        # true members is exactly the false-positive count
        assert r.n_bloom_pass == r.n_member + r.n_false_pos
        assert r.n_bloom_pass <= r.n_events


def test_bloom_fp_rate_is_small_on_disjoint_probe(spark):
    # keys 0..99 in the filter; probe 100k disjoint keys — with
    # m=4096, k=3 and 100 keys the expected fp rate is ~(1-e^-kn/m)^k
    # ≈ 3e-4; assert an order-of-magnitude bound, deterministically
    # (the hash is fixed, so this is a pinned result, not a flake).
    keys = spark.range(0, 100).withColumnRenamed("id", "k")
    probe = spark.range(1000, 21000).withColumnRenamed("id", "k")
    words = sketches.bloom_build(keys, "k", m_bits=4096, k_hashes=3)
    out = sketches.bloom_probe(probe, words, "k", m_bits=4096, k_hashes=3)
    fp = out.where("bloom_pass").count()
    assert fp < 20000 * 0.01


def test_ams_f2_split_merge_and_accuracy(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events")
    out = sketches.ams_f2(ev, "user_id").collect()[0]
    assert out.f2_exact > 0
    # 16 sketches: estimator std is ~sqrt(2/16)·F2 — assert a loose
    # deterministic bound (fixed hashes make this a pinned value)
    assert out.rel_err < 1.0
    # partitioning invariance: exact integer arithmetic end-to-end
    a = sketches.ams_f2(ev.coalesce(1), "user_id").collect()[0]
    b = sketches.ams_f2(ev.repartition(13), "user_id").collect()[0]
    assert a == b


def test_hll_matches_pure_python_replay(spark, sf_dir):
    """Full bit-level replay of hll_distinct in plain Python from the
    same md5 hash spec — registers, exact-scaled sum, the estimator
    branch, and the literal linear-counting table must all agree to
    the last rounded digit (both branches are exercised across the
    fixture's event_type groups or the test is vacuous). The fixture
    groups all land in the linear-counting branch at this SF, so a
    synthetic 5000-key group is unioned in to force the raw-estimator
    branch too."""
    import hashlib
    import math

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    big = spark.range(5000).select(
        F.lit("zz_big").alias("event_type"), F.col("id").alias("user_id")
    )
    ev = ev.unionByName(big)
    got = {
        r["grp"]: (r["n_exact"], r["n_est"], r["rel_err"])
        for r in sketches.hll_distinct(
            ev, key_col="user_id", group_col="event_type", b=8
        ).collect()
    }

    m, w, k_max = 256, 52, 53
    alpha = 0.7213 / (1 + 1.079 / m)
    c_num = alpha * m * m * float(1 << k_max)
    lc = [m * math.log(m / v) for v in range(1, m)]
    groups: dict[str, set[int]] = {}
    for row in ev.select("event_type", "user_id").collect():
        h = int(
            hashlib.md5(str(row["user_id"]).encode()).hexdigest()[:15], 16
        )
        groups.setdefault(row["event_type"], set()).add(h)
    branches = set()
    for grp, hashes in groups.items():
        regs: dict[int, int] = {}
        for h in hashes:
            rem = h % (1 << w)
            rho = k_max if rem == 0 else w + 1 - rem.bit_length()
            bkt = h >> w
            regs[bkt] = max(regs.get(bkt, 0), rho)
        s = sum(1 << (k_max - mj) for mj in regs.values()) + (
            m - len(regs)
        ) * (1 << k_max)
        e_raw = c_num / float(s)
        v = m - len(regs)
        if e_raw <= 2.5 * m and v > 0:
            est = lc[v - 1]
            branches.add("linear")
        else:
            est = e_raw
            branches.add("raw")
        n_exact = len(hashes)
        assert got[grp][0] == n_exact
        assert got[grp][1] == round(est, 4)
        assert got[grp][2] == round(abs(est - n_exact) / n_exact, 4)
    assert branches == {"linear", "raw"} or len(groups) < 4, branches


def test_hll_merge_is_register_max(spark, sf_dir):
    """The sketch contract: registers of a union equal the elementwise
    max-merge of the parts' registers — maintainable at rest without
    re-scanning history."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    whole = sketches.hll_registers(ev, "user_id", "event_type")
    merged = (
        sketches.hll_registers(a, "user_id", "event_type")
        .unionByName(sketches.hll_registers(b, "user_id", "event_type"))
        .groupBy("grp", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    lhs = {(r["grp"], r["bucket"]): r["m_j"] for r in whole.collect()}
    rhs = {(r["grp"], r["bucket"]): r["m_j"] for r in merged.collect()}
    assert lhs == rhs


def test_hll_error_within_sketch_bound(spark, sf_dir):
    """m=256 gives ~1.04/sqrt(m) = 6.5% standard error; assert every
    fixture group sits inside a loose 4-sigma envelope (deterministic:
    fixed hashes make this a pinned value, not a flaky statistic)."""
    out = sketches.hll_distinct(
        load_table(spark, sf_dir, "events"), "user_id", "event_type"
    ).collect()
    assert out
    for r in out:
        assert r["rel_err"] <= 4 * 1.04 / (256 ** 0.5), (
            r["grp"],
            r["rel_err"],
        )
