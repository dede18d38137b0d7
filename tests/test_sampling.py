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
