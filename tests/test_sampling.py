"""Deterministic sampling/splitting: membership must be a pure
function of the row id — invariant under partitioning — and fractions
must land near their targets."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import sampling
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


def test_hash_sample_invariant_under_partitioning(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ids = lambda df: sorted(r["event_id"] for r in df.select("event_id").collect())  # noqa: E731
    base = ids(sampling.hash_sample(ev, "event_id", 0.2))
    assert base == ids(sampling.hash_sample(ev.repartition(17), "event_id", 0.2))
    assert base == ids(sampling.hash_sample(ev.coalesce(1), "event_id", 0.2))


def test_hash_sample_fraction_close(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    got = sampling.hash_sample(ev, "event_id", 0.2).count()
    assert abs(got / n - 0.2) < 0.1  # 1000 ids at sf0.001: generous CI


def test_hash_split_partitions_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.hash_split(docs, "doc_id")
    # total preserved, labels exhaustive, monotone larger train share
    by = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(by.values()) == docs.count()
    assert set(by) <= {"train", "val", "test"}
    assert by["train"] > by.get("val", 0) and by["train"] > by.get("test", 0)


def test_hash_split_no_shuffle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        sampling.hash_split(docs, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_chunk_documents_reconstructs_text(spark, sf_dir):
    """Dropping each chunk's overlap tail and concatenating must give
    back the original text — the no-gap/no-loss chunking property."""
    from real_time_stock_market_data_pipeline__spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents").limit(60)
    chunks = T.chunk_documents(docs, chunk_chars=200, overlap=40)
    stride = 160
    got = {}
    for r in chunks.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"]
    for r in docs.collect():
        parts = got[r["doc_id"]]
        n = len(parts)
        rebuilt = "".join(parts[i][:stride] for i in range(n - 1)) + parts[n - 1]
        assert rebuilt == r["text"], r["doc_id"]


def test_zorder_locality_beats_row_order(spark, sf_dir):
    """The point of the Morton key: sorting by zkey keeps 2-D
    neighbors adjacent. Law check: for rows adjacent in zkey order,
    the mean 2-D bucket (Chebyshev) distance is far below the mean
    distance of randomly ordered (key-ordered) rows."""
    from real_time_stock_market_data_pipeline__spark.operators import sampling

    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    out = sampling.zorder_key(part, "p_size", "p_retailprice", bits=8).select(
        "p_partkey", "bucket_a", "bucket_b", "zkey"
    )
    rows = out.collect()

    def mean_adjacent_dist(seq):
        ds = [
            max(abs(x.bucket_a - y.bucket_a), abs(x.bucket_b - y.bucket_b))
            for x, y in zip(seq, seq[1:])
        ]
        return sum(ds) / len(ds)

    by_z = sorted(rows, key=lambda r: (r.zkey, r.p_partkey))
    by_key = sorted(rows, key=lambda r: r.p_partkey)
    assert mean_adjacent_dist(by_z) < 0.5 * mean_adjacent_dist(by_key)


def test_zorder_bounds_and_determinism(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import sampling

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = sampling.zorder_key(part, "p_size", "p_retailprice", bits=8)
    rows = out.select("p_partkey", "bucket_a", "bucket_b", "zkey").collect()
    for r in rows:
        assert 0 <= r.bucket_a <= 255 and 0 <= r.bucket_b <= 255
        assert 0 <= r.zkey < (1 << 16)
    rows2 = sampling.zorder_key(
        part.repartition(11, "p_brand"), "p_size", "p_retailprice", bits=8
    ).select("p_partkey", "bucket_a", "bucket_b", "zkey").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_skew_stats_shares(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = metrics.skew_stats(docs, "lang", top_n=100).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4  # top-100 covers all
    assert all(r.vs_mean_ratio > 0 for r in rows)
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_balanced_downsample_equalizes_classes(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    out = sampling.balanced_downsample(docs, "lang", "doc_id")
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    orig = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    cap = min(orig.values())
    assert set(sizes) == set(orig)
    for lang, n in sizes.items():
        assert n == cap
    # determinism: kept set is a pure function of the data
    again = sampling.balanced_downsample(docs, "lang", "doc_id")
    assert out.exceptAll(again).count() == 0
