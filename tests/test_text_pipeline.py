"""Law tests for the training-data text operators: PII scrubbing,
tf-idf ranking, decontamination, and token packing. The oracle gate
checks value equality against DuckDB; these pin the *invariants* that
must hold under any refactor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import text
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


def test_pii_redact_masks_everything_it_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk or call 5551234567"),
            (2, "two mails a@b.io c@d.org and digits 12345678901"),
            (3, "clean text, short number 123456 stays"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.pii_redact(docs).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_long_numbers"] == 1
    assert "<EMAIL>" in out[1]["clean_text"] and "<NUM>" in out[1]["clean_text"]
    assert out[2]["n_emails"] == 2 and out[2]["n_long_numbers"] == 1
    # 6-digit run is below the long-number threshold: left intact
    assert out[3]["n_emails"] == 0 and out[3]["n_long_numbers"] == 0
    assert out[3]["clean_text"] == "clean text, short number 123456 stays"
    # nothing maskable survives in any clean_text
    residue = text.pii_redact(
        text.pii_redact(docs).select(
            "doc_id", F.col("clean_text").alias("text")
        )
    )
    assert residue.filter(
        (F.col("n_emails") > 0) | (F.col("n_long_numbers") > 0)
    ).count() == 0


def test_tfidf_top_terms_ranks_are_dense_and_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = text.tfidf_top_terms(docs, k=3)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_set("rank").alias("ranks"),
    )
    bad = per_doc.filter(
        (F.col("n") > 3) | (F.array_min("ranks") != 1)
    ).count()
    assert bad == 0
    # a common word (high df) must not outrank a rarer one with equal tf
    assert out.filter(F.col("tfidf") < 0).count() == 0  # smoothed idf >= 0 here


def test_decontaminate_flags_exact_copies_and_spares_unique_text(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different sentence with unique vocabulary"),
            (3, "the quick brown fox jumps over something else entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.decontaminate(corpus, bench).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] > 0  # exact copy
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["contaminated"]  # shares the 5-gram prefix
    assert out[3]["n_hits"] < out[1]["n_hits"]


def test_token_pack_offsets_are_exact_and_order_preserving(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs).select(
        "doc_id",
        "chunk_idx",
        F.size(F.split("chunk_text", " ")).alias("n_tokens"),
        F.lit("all").alias("shard"),
    )
    packed = text.token_pack(
        chunks, ["shard"], ["doc_id", "chunk_idx"], "n_tokens", budget=128
    )
    rows = packed.orderBy("doc_id", "chunk_idx").collect()
    # replay the prefix sum: bin/offset must match exact integer math
    prior = 0
    for r in rows:
        assert r["bin_id"] == prior // 128, r
        assert r["bin_offset"] == prior % 128, r
        prior += r["n_tokens"]
    # bins start at 0 and are contiguous
    bins = sorted({r["bin_id"] for r in rows})
    assert bins == list(range(len(bins)))


def test_token_pack_greedy_never_overflows_a_shared_bin(spark, sf_dir):
    """First-fit law: a bin's total exceeds the budget only when it
    holds a single oversize chunk; bin ids are contiguous per group and
    bin_fill replays the within-bin prefix sum."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_documents(docs).select(
        "doc_id",
        "chunk_idx",
        F.size(F.split("chunk_text", " ")).alias("n_tokens"),
        (F.col("doc_id") % 4).alias("shard"),
    )
    budget = 64
    packed = text.token_pack_greedy(
        chunks, ["shard"], ["doc_id", "chunk_idx"], "n_tokens", budget=budget
    )
    per_bin = (
        packed.groupBy("shard", "bin_id")
        .agg(F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    for r in per_bin:
        assert r["total"] <= budget or r["n"] == 1, r
    # replay per group: fill is the running total within the bin
    for shard in range(4):
        rows = (
            packed.filter(F.col("shard") == shard)
            .orderBy("doc_id", "chunk_idx")
            .collect()
        )
        bin_id, fill = 0, 0
        for r in rows:
            if fill > 0 and fill + r["n_tokens"] > budget:
                bin_id, fill = bin_id + 1, 0
            assert (r["bin_id"], r["bin_fill"]) == (bin_id, fill), r
            fill += r["n_tokens"]


def test_winsorize_clamps_only_outside_band(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import metrics

    ev = load_table(spark, sf_dir, "events")
    out = metrics.winsorize(ev, "event_type", "value", "event_id")
    assert out.filter(
        (F.col("clipped") < F.col("lo_band"))
        | (F.col("clipped") > F.col("hi_band"))
    ).count() == 0
    assert out.filter(
        F.col("value").between(F.col("lo_band"), F.col("hi_band"))
        & (F.col("clipped") != F.col("value"))
    ).count() == 0
    # roughly 10% of rows clamp at a 5/95 band (loose bound)
    n, clamped = out.count(), out.filter(F.col("clipped") != F.col("value")).count()
    assert 0 < clamped < 0.2 * n


def test_neardup_clusters_agree_with_pairs(spark, sf_dir):
    """Component law: both endpoints of every LSH pair share a cluster;
    every cluster's id is the minimum doc id it contains; every doc is
    labeled exactly once."""
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.dedup_minhash_pairs(docs)
    clusters = dedup.neardup_clusters(docs)
    assert clusters.count() == docs.count()
    assert clusters.select("doc_id").distinct().count() == docs.count()
    ca = clusters.select(
        F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("ca")
    )
    cb = clusters.select(
        F.col("doc_id").alias("id_b"), F.col("cluster_id").alias("cb")
    )
    assert pairs.join(ca, "id_a").join(cb, "id_b").filter(
        F.col("ca") != F.col("cb")
    ).count() == 0
    mins = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("m"))
    assert mins.filter(F.col("cluster_id") != F.col("m")).count() == 0
    # exactly one canonical doc per cluster
    canon = clusters.filter("is_canonical").groupBy("cluster_id").count()
    assert canon.filter(F.col("count") != 1).count() == 0


def test_dedup_corpus_keeps_exactly_canonicals(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = dedup.dedup_corpus(docs)
    clusters = dedup.neardup_clusters(docs)
    n_canon = clusters.filter(F.col("is_canonical")).count()
    assert corpus.count() == n_canon < docs.count()
    assert corpus.columns == docs.columns  # payload intact
    # kept ids are exactly the canonical labels
    kept = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    canon = {r["doc_id"] for r in clusters.filter(F.col("is_canonical")).collect()}
    assert kept == canon


def test_quality_filter_monotone_in_threshold(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import text

    docs = load_table(spark, sf_dir, "documents")
    loose = text.quality_filter(docs, min_score=0.0, min_words=0)
    tight = text.quality_filter(docs, min_score=0.8, min_words=30)
    n_loose, n_tight = loose.count(), tight.count()
    assert n_loose == docs.count()  # zero thresholds keep everything
    assert 0 < n_tight < n_loose
    rows = tight.collect()
    assert all(r["quality_score"] >= 0.8 and r["n_words"] >= 30 for r in rows)


def test_text_operators_compose_with_streams(spark, sf_dir, tmp_path):
    """text_stats / quality_filter are narrow (no aggregation), so the
    same library calls must run unchanged on a streaming frame — the
    composability contract that lets the LLM-pipeline operators sit
    behind a file or Kafka source without a batch rewrite."""
    import os

    from real_time_stock_market_data_pipeline__spark.operators import text

    src_dir = str(tmp_path / "docs_stream")
    os.makedirs(src_dir)
    load_table(spark, sf_dir, "documents").limit(100).write.mode(
        "overwrite"
    ).parquet(src_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
    )
    gated = text.quality_filter(stream, min_score=0.0, min_words=0)
    assert gated.isStreaming
    q = (
        gated.writeStream.format("memory")
        .queryName("stream_quality")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("stream_quality")
    want = text.quality_filter(
        spark.read.parquet(src_dir), min_score=0.0, min_words=0
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_simhash_neardup_pairs_finds_near_identical_docs(spark):
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, "  " + base.upper() + "  "),  # normalizes to identical tokens
        (3, "completely different subject matter about spark physical plans"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.simhash_neardup_pairs(docs, max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(p in {(1, 2), (1, 3), (2, 3)} for p in got)
    rows_h = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert rows_h[(1, 2)] == 0  # identical token sets → identical fingerprints
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    with pytest.raises(ValueError, match="max_hamming"):
        dedup.simhash_neardup_pairs(docs, max_hamming=5)


@pytest.mark.slow
def test_pair_families_clone_collapse_equals_uncollapsed(spark, sf_dir):
    """Law (round-9 verdict ask #3): the exact-clone collapse pre-pass
    in dedup_minhash_pairs / simhash_neardup_pairs produces output
    IDENTICAL to the uncollapsed band scan — on the real corpus plus
    adversarial clone fixtures: exact clones, raw-text-differs-but-
    normalizes-equal clones, sub-shingle-length clone groups (pair in
    SimHash, excluded from MinHash banding), NULL-text clones (never
    pair anywhere), and an empty-text doc."""
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    extra = spark.createDataFrame(
        [
            (90001, "alpha beta gamma delta epsilon zeta"),
            (90002, "alpha beta gamma delta epsilon zeta"),
            (90003, "  ALPHA   beta GAMMA delta epsilon zeta "),
            (90004, "tiny doc"),
            (90005, "tiny doc"),
            (90006, None),
            (90007, None),
            (90008, ""),
        ],
        "doc_id: long, text: string",
    )
    corpus = docs.select("doc_id", "text").unionByName(extra)

    mh_c = sorted(map(tuple, dedup.dedup_minhash_pairs(
        corpus, collapse_clones=True).collect()))
    mh_u = sorted(map(tuple, dedup.dedup_minhash_pairs(
        corpus, collapse_clones=False).collect()))
    assert mh_c == mh_u
    mh = set(mh_c)
    assert (90001, 90002) in mh and (90001, 90003) in mh
    assert (90004, 90005) not in mh  # < shingle_k words: no bands
    assert not any(90006 in p or 90007 in p for p in mh)

    sh_c = sorted(map(tuple, dedup.simhash_neardup_pairs(
        corpus, collapse_clones=True).collect()))
    sh_u = sorted(map(tuple, dedup.simhash_neardup_pairs(
        corpus, collapse_clones=False).collect()))
    assert sh_c == sh_u
    sh = {(a, b): h for a, b, h in sh_c}
    assert sh[(90001, 90002)] == 0 and sh[(90001, 90003)] == 0
    assert sh[(90004, 90005)] == 0  # short docs DO pair under SimHash
    assert not any(90006 in p or 90007 in p for p in sh)

    # no cartesian anywhere in the collapsed plans
    for df in (dedup.dedup_minhash_pairs(corpus, collapse_clones=True),
               dedup.simhash_neardup_pairs(corpus, collapse_clones=True)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.slow
def test_pair_families_powerlaw_clone_skew(spark):
    """Power-law clone skew (round-11 verdict ask #7): web corpora are
    not uniformly cloned — one boilerplate text can carry ~50% of all
    rows. With a 600-row corpus whose dominant text owns 300 rows: the
    auto probe engages, collapsed == uncollapsed on both pair
    families, the dominant group emits exactly its C(300,2) intra-
    group pairs (the output floor — irreducible for pair semantics),
    and the collapsed plans stay cartesian-free. The banded candidate
    volume the collapse removes is the measured A/B in BASELINE.md."""
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    dominant = "the dominant boilerplate footer text that is everywhere"
    rows = [(i, dominant) for i in range(300)] + [
        (300 + i, f"unique document {i} carrying distinct words {i * 7}")
        for i in range(300)
    ]
    corpus = spark.createDataFrame(rows, "doc_id: long, text: string")
    # 301 distinct / 600 rows ≈ 0.50 ≤ 0.9 threshold → probe engages
    assert dedup._should_collapse(corpus, "doc_id", "text", "auto")

    n_dom_pairs = 300 * 299 // 2
    for fam in (dedup.dedup_minhash_pairs, dedup.simhash_neardup_pairs):
        c = fam(corpus, collapse_clones=True)
        u = fam(corpus, collapse_clones=False)
        got_c = sorted((r["id_a"], r["id_b"]) for r in c.collect())
        got_u = sorted((r["id_a"], r["id_b"]) for r in u.collect())
        assert got_c == got_u
        dom = [p for p in got_c if p[0] < 300 and p[1] < 300]
        assert len(dom) == n_dom_pairs
        plan = c._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_clone_collapse_auto_probe(spark):
    """The "auto" spec engages the collapse pre-pass only when clone
    mass is significant (distinct/total ≤ threshold): a clone-light
    corpus must keep the direct scan (the pre-pass costs ~3 corpus
    exchanges), a replicated corpus must collapse; NULL texts don't
    count; output is identical either way (the equality law above)."""
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    light = spark.createDataFrame(
        [(i, f"unique document number {i} with words") for i in range(50)]
        + [(50, "unique document number 0 with words")],
        "doc_id: long, text: string",
    )
    heavy = spark.createDataFrame(
        [(i, f"cloned text {i % 5}") for i in range(50)],
        "doc_id: long, text: string",
    )
    assert not dedup._should_collapse(light, "doc_id", "text", "auto")
    assert dedup._should_collapse(heavy, "doc_id", "text", "auto")
    assert dedup._should_collapse(light, "doc_id", "text", True)
    assert not dedup._should_collapse(heavy, "doc_id", "text", False)
    # empty / all-NULL corpora never engage (and never crash)
    empty = light.limit(0)
    assert not dedup._should_collapse(empty, "doc_id", "text", "auto")
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id: long, text: string"
    )
    assert not dedup._should_collapse(nulls, "doc_id", "text", "auto")


def test_sentence_dedup_stats_detects_cross_doc_boilerplate(spark):
    rows = [
        (1, "unique alpha sentence one. shared boilerplate footer text here"),
        (2, "unique beta sentence two. shared boilerplate footer text here"),
        (3, "totally independent content with no shared parts at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.sentence_dedup_stats(docs).collect()}
    assert out[1]["n_sentences"] == 2 and out[1]["n_shared"] == 1
    assert out[1]["shared_fraction"] == 0.5
    assert out[2]["n_shared"] == 1
    assert out[3]["n_shared"] == 0 and out[3]["shared_fraction"] == 0.0


def test_substring_dedup_removes_repeats_keeps_first(spark):
    """Lee-et-al-style exact substring dedup at 4-word blocks: a full
    clone of doc 1 loses every block; a doc sharing one block keeps
    the rest; a repeated block WITHIN one doc is also collapsed to its
    first occurrence; reconstruction md5 equals the hand-computed
    surviving text."""
    import hashlib

    from real_time_stock_market_data_pipeline__spark.operators import dedup

    rows = [
        (1, "a b c d e f g h"),            # blocks: "a b c d", "e f g h"
        (2, "a b c d e f g h"),            # clone -> nothing survives
        (3, "a b c d x y z w"),            # first block shared -> half
        (4, "p q r s p q r s"),            # intra-doc repeat -> first kept
        (5, "only five words here now"),   # unique, partial last block
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.substring_dedup(docs, n_words=4).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (out[1]["n_blocks"], out[1]["n_kept"]) == (2, 2)
    assert out[1]["dedup_text_md5"] == md5("a b c d e f g h")
    assert (out[2]["n_blocks"], out[2]["n_kept"]) == (2, 0)
    assert out[2]["dedup_text_md5"] == md5("")
    assert (out[3]["n_blocks"], out[3]["n_kept"]) == (2, 1)
    assert out[3]["dedup_text_md5"] == md5("x y z w")
    assert (out[4]["n_blocks"], out[4]["n_kept"]) == (2, 1)
    assert out[4]["dedup_text_md5"] == md5("p q r s")
    assert (out[5]["n_blocks"], out[5]["n_kept"]) == (2, 2)
    assert out[5]["dedup_text_md5"] == md5("only five words here now")


def test_substring_dedup_adversarial_differential(spark, tmp_path):
    """Cross-engine differential on adversarial texts the corpus never
    exercises: repeated spaces (split emits empty words in BOTH
    engines), leading/trailing spaces, an empty string, unicode words,
    single-word docs, and texts whose length is exactly / one-off a
    block multiple. Spark operator vs the DuckDB oracle SQL over the
    same parquet."""
    import duckdb

    from real_time_stock_market_data_pipeline__spark import driver_queries as dq
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    rows = [
        (0, "a  b c   d"),                 # runs of spaces -> empty words
        (1, " leading and trailing "),
        (2, ""),
        (3, "één ünïcode wörd stream één ünïcode wörd stream"),
        (4, "solo"),
        (5, "w1 w2 w3 w4 w5 w6 w7 w8"),    # exactly one 8-block
        (6, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), # one full + 1-word tail
        (7, "a  b c   d"),                 # clone of 0
        (8, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    pq_path = str(tmp_path / "adv_docs.parquet")
    docs.toPandas().to_parquet(pq_path)

    got = sorted(
        tuple(r) for r in dedup.substring_dedup(docs).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq_path}'")
    want = sorted(tuple(r) for r in con.execute(
        dq.ORACLES["substring_dedup"]
    ).fetchall())
    con.close()
    assert got == want
    by_id = {t[0]: t for t in got}
    assert 8 not in by_id                  # NULL text dropped
    assert by_id[7][2] == 0                # clone keeps nothing
    assert by_id[5][1:3] == (1, 1)         # exact block multiple


def test_substring_dedup_incremental_equals_batch_restriction(spark, sf_dir):
    """Crawl-shape law: screening batch B against a block index built
    on corpus C (ids(C) < ids(B)) equals substring_dedup(C ∪ B)
    restricted to B's docs — stored blocks outrank arriving ones.
    Also: a batch doc that is a full clone of a corpus doc keeps
    nothing; an all-novel doc keeps everything."""
    import tempfile

    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import dedup
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    corpus = docs.filter(F.col("doc_id") < n // 2)
    # batch = the other half plus two hand probes
    probe_clone = corpus.orderBy("doc_id").first()["text"]
    extra = spark.createDataFrame(
        [
            (n + 1, probe_clone),                     # full corpus clone
            (n + 2, "entirely novel words q1 q2 q3 q4 q5 q6 q7 q8"),
        ],
        "doc_id: long, text: string",
    )
    batch = docs.filter(F.col("doc_id") >= n // 2).unionByName(extra)

    path = tempfile.mkdtemp(prefix="blockidx_t_") + "/index"
    dedup.write_block_index(corpus, path)
    inc = {
        r["doc_id"]: tuple(r)[1:]
        for r in dedup.substring_dedup_incremental(batch, path).collect()
    }
    full = {
        r["doc_id"]: tuple(r)[1:]
        for r in dedup.substring_dedup(
            corpus.unionByName(batch)
        ).collect()
        if r["doc_id"] >= n // 2
    }
    assert inc == full
    assert inc[n + 1][1] == 0            # clone keeps no blocks
    novel = inc[n + 2]
    assert novel[0] == novel[1] > 0      # novel doc keeps everything


@pytest.mark.slow
def test_stream_substring_ingest_matches_batch_and_grows_index(
    spark, sf_dir, tmp_path
):
    """Streaming ExactSubstr service law: index built on corpus C
    (id-prefix half), two single-file drains of batches B1, B2 (id
    order), plus a no-input drain. Then (a) the rewritten docs equal
    substring_dedup(C ∪ B1 ∪ B2, emit_text=True) restricted to the
    batches, and (b) the index holds exactly the distinct block
    digests of the whole union."""
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import dedup
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    corpus = docs.filter(F.col("doc_id") < n // 2)
    b1 = docs.filter(
        (F.col("doc_id") >= n // 2) & (F.col("doc_id") < 3 * n // 4)
    )
    b2 = docs.filter(F.col("doc_id") >= 3 * n // 4)

    idx = str(tmp_path / "blockidx")
    out = str(tmp_path / "rewritten")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    dedup.write_block_index(corpus, idx, partitioned=True)

    def drain():
        src = pipeline.read_file_stream(spark, in_dir, schema=docs.schema)
        q = pipeline.stream_substring_ingest(src, idx, out, ckpt)
        q.awaitTermination()

    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    drain()  # no new input: both sinks unchanged

    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["dedup_text"])
        for r in dedup.substring_dedup(docs, emit_text=True).collect()
        if r["doc_id"] >= n // 2
    }
    assert got == want

    stored = {
        r["block_md5"] for r in spark.read.parquet(idx).collect()
    }
    expect = {
        r["d"]
        for r in dedup._doc_blocks(docs, "doc_id", "text", 8)
        .select(F.md5("block").alias("d"))
        .distinct()
        .collect()
    }
    assert stored == expect


def test_lexical_diversity_bounds(spark, sf_dir):
    import math

    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_lexical_diversity,
    )

    rows = q_lexical_diversity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 < r.ttr <= 1.0 + 1e-9
        # entropy of n_types outcomes is bounded by log2(n_types)
        assert -1e-6 <= r.token_entropy <= math.log2(r.n_types) + 1e-4


def test_zipf_slope_negative_on_corpus(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_zipf_slope,
    )

    r = q_zipf_slope(spark, sf_dir).collect()[0]
    assert r.n_terms >= 10
    # frequency must decay with rank on any natural-ish corpus
    assert r.zipf_slope < 0


def test_lang_balance_weights_normalize_and_upsample_tail(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_lang_balance_weights,
    )
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    rows = q_lang_balance_weights(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-3
    # alpha < 1 flattens the mix: the rarest language is upsampled,
    # the most common downsampled
    by_n = sorted(rows, key=lambda r: r.n_docs)
    if by_n[0].n_docs != by_n[-1].n_docs:
        assert by_n[0].sample_weight > 1.0
        assert by_n[-1].sample_weight < 1.0
    # alpha = 1 is the identity mix
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ident = t.lang_balance_weights(docs, alpha=1.0).collect()
    for r in ident:
        assert abs(r.sample_weight - 1.0) < 1e-4


def test_lang_confusion_is_a_partition_with_shares(spark, sf_dir):
    from collections import defaultdict

    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_lang_confusion,
    )

    rows = q_lang_confusion(spark, sf_dir).collect()
    assert rows
    docs_total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs_total
    shares = defaultdict(float)
    for r in rows:
        shares[r.lang_actual] += r.share_of_actual
    for lang, s in shares.items():
        assert abs(s - 1.0) < 1e-3, lang


def test_readability_hand_case_and_bounds(spark):
    from real_time_stock_market_data_pipeline__spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "no terminal punctuation here"),
            (3, ""),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in T.readability_scores(docs).collect()}
    # doc 1: two sentences, six words
    assert rows[1].n_sentences == 2
    assert rows[1].n_words == 6
    # monosyllabic words -> one vowel group each
    assert rows[1].n_syllables == 6
    # Flesch ease for 3 words/sentence, 1 syllable/word:
    # 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert abs(rows[1].flesch_ease - 119.19) < 1e-6
    # doc 2: fragment floors at one sentence
    assert rows[2].n_sentences == 1
    assert rows[2].n_words == 4
    # doc 3: empty text hits every greatest(...,1) floor, no NULLs/Inf
    assert rows[3].n_sentences == 1 and rows[3].n_words == 1
    assert rows[3].flesch_ease is not None


def test_bigram_lm_gibberish_scores_worse(spark):
    from real_time_stock_market_data_pipeline__spark.operators import text as T

    normal = [
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(20)
    ]
    docs = spark.createDataFrame(
        normal + [(99, "zq xv qz jx vq xj zz qq xx jj")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in T.bigram_lm_scores(docs).collect()}
    typical = sum(out[i].avg_neg_log2 for i in range(20)) / 20
    # rare-bigram gibberish is far less probable under the corpus LM
    assert out[99].avg_neg_log2 > typical + 1.0
    for r in out.values():
        assert r.avg_neg_log2 >= 0


def test_fuzzy_join_complete_at_distance_one(spark):
    from real_time_stock_market_data_pipeline__spark.operators import text as T

    canon = spark.createDataFrame(
        [("spark",), ("sharp",), ("shark",), ("apache",)], "name string"
    )
    probes = spark.createDataFrame(
        [("spak",), ("sprak",), ("ahark",), ("apache",), ("zzz",)],
        "q string",
    )
    pairs = {
        (r.left_value, r.right_value)
        for r in T.fuzzy_join_symdelete(probes, canon, "q", "name").collect()
    }
    # deletion ("spak"), substitution ("ahark"->"shark"), exact match
    assert ("spak", "spark") in pairs
    assert ("ahark", "shark") in pairs
    assert ("apache", "apache") in pairs
    # "sprak" is a transposition of "spark": levenshtein distance 2 -> excluded
    assert all(l != "sprak" for l, _ in pairs)
    assert all(l != "zzz" for l, _ in pairs)


def test_pii_spans_match_redactor_counts(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_pii_redact,
        q_pii_spans,
    )
    import collections

    spans = q_pii_spans(spark, sf_dir).collect()
    counts = collections.Counter((r.doc_id, r.span_type) for r in spans)
    for r in q_pii_redact(spark, sf_dir).collect():
        assert counts.get((r.doc_id, "email"), 0) == r.n_emails
        assert counts.get((r.doc_id, "long_number"), 0) == r.n_long_numbers
    # every extracted email really matches the pattern shape
    assert all("@" in r.span_text for r in spans if r.span_type == "email")


def test_charset_stats_ratios_partition_unity(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = t.charset_stats(docs).collect()
    assert rows
    for r in rows:
        assert (
            r.n_letter + r.n_digit + r.n_space + r.n_ascii_other + r.n_non_ascii
            == r.n_chars
        )
        if r.n_chars:
            s = r.letter_ratio + r.digit_ratio + r.space_ratio + r.non_ascii_ratio
            assert s <= 1.0 + 1e-6


def test_charset_stats_flags_binary_spill(spark):
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "A perfectly ordinary English sentence."),
            (2, "#$%^&*()!@ 0x00 1234 ~~ ||| ### $$$ %%%"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in t.charset_stats(docs).collect()}
    assert out[1].suspect_charset == 0
    assert out[2].suspect_charset == 1
    assert out[3].suspect_charset == 0 and out[3].n_chars == 0


def test_cluster_aware_split_keeps_clusters_together(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.cluster_aware_split(docs)
    assert out.count() == docs.count()
    # every member of one split_key shares one split label
    violations = (
        out.groupBy("split_key")
        .agg(F.count_distinct("split").alias("k"))
        .where("k > 1")
        .count()
    )
    assert violations == 0
    # the split keys of clustered docs are the cluster ids
    clusters = dedup.neardup_clusters(docs)
    joined = out.join(clusters, "doc_id").where(
        F.col("split_key") != F.col("cluster_id")
    )
    assert joined.count() == 0


def test_containment_catches_quote_inclusion(spark):
    from real_time_stock_market_data_pipeline__spark.operators import dedup

    short = "alpha beta gamma delta epsilon zeta eta theta"
    long = (
        "intro words before the quote " + short + " and plenty of trailing "
        "commentary that dilutes the union so symmetric jaccard stays low "
        "while containment of the short side is perfect and more filler "
        "words keep arriving here to stretch the long document further"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    cont = dedup.ngram_containment_pairs(docs, threshold=0.8).collect()
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    # the quote-inclusion pair must clear the containment gate...
    if cont:  # only if LSH banded them together (deterministic either way)
        r = cont[0]
        assert max(r.containment_a, r.containment_b) >= 0.8
        # ...while symmetric jaccard at the same threshold misses it
        assert not jac


def test_trending_terms_planted_burst(spark):
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    docs = spark.createDataFrame(
        [(i, "common words everywhere", 0) for i in range(10)]
        + [(100 + i, "common words everywhere plus blockchain", 1) for i in range(10)],
        "doc_id long, text string, is_b int",
    )
    out = t.trending_terms(docs, side_col="is_b", top_k=5).collect()
    assert out[0].term == "blockchain"
    assert out[0].trend_score > 0
    assert out[0].c_a == 0 and out[0].c_b == 10


def test_hashed_bow_deterministic_and_conserves_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = t.hashed_bow(docs, n_features=256)
    b = t.hashed_bow(docs, n_features=256)
    assert a.exceptAll(b).count() == 0
    for r in a.collect()[:50]:
        assert abs(r.weight) <= r.n_tokens
        assert 0 <= r.bucket < 256


def test_strip_boilerplate_removes_shared_footer(spark):
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    footer = "subscribe to our newsletter for more"
    docs = spark.createDataFrame(
        [
            (1, f"unique thoughts one. {footer}."),
            (2, f"different prose two. {footer}."),
            (3, f"third body text here. {footer}."),
            (4, "no footer in this one at all."),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in t.strip_boilerplate(docs, max_df=2).collect()}
    # the footer appears in 3 docs > max_df=2 -> stripped everywhere
    for i in (1, 2, 3):
        assert footer not in out[i].cleaned_text
        assert out[i].n_dropped == 1
        assert out[i].cleaned_text  # unique sentence survives
    assert out[4].n_dropped == 0
    assert "no footer" in out[4].cleaned_text
    assert out[5].cleaned_text == "" and out[5].n_sentences == 0


def test_strip_boilerplate_preserves_order(spark):
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    docs = spark.createDataFrame(
        [(1, "alpha first. beta second. gamma third.")],
        "doc_id long, text string",
    )
    out = t.strip_boilerplate(docs, max_df=2).collect()[0]
    assert out.cleaned_text.index("alpha") < out.cleaned_text.index("beta")
    assert out.cleaned_text.index("beta") < out.cleaned_text.index("gamma")


def test_length_band_filter_drops_tails_per_group(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import text as t

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = t.length_band_filter(docs)
    n_in = docs.count()
    n_kept = kept.count()
    assert 0 < n_kept <= n_in
    for r in kept.collect():
        assert r.lo_band <= r.n_words <= r.hi_band
    # per group, the kept fraction is ~90% (p5..p95), never below 80%
    per = kept.groupBy("lang").count().collect()
    orig = {r.lang: r[1] for r in docs.groupBy("lang").count().collect()}
    for r in per:
        assert r[1] / orig[r.lang] >= 0.8


@pytest.mark.slow
def test_stream_neardup_ingest_matches_batch_and_grows_index(
    spark, sf_dir, tmp_path
):
    """Streaming MinHash near-dup service law: corpus band index built
    on the id-prefix half, two single-file drains of batches B1, B2
    (id order), plus a no-input drain. Then (a) the verdict log equals
    neardup_screen(B1 ∪ B2, corpus) — the all-arrivals-enter-history
    rule makes multi-batch ≡ one concatenated batch — and (b) the
    stream band index holds exactly minhash_bands(B1 ∪ B2)."""
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import dedup
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    corpus = docs.filter(F.col("doc_id") < n // 2)
    b1 = docs.filter(
        (F.col("doc_id") >= n // 2) & (F.col("doc_id") < 3 * n // 4)
    )
    b2 = docs.filter(F.col("doc_id") >= 3 * n // 4)

    cbp = str(tmp_path / "corpus_bands")
    sbp = str(tmp_path / "stream_bands")
    out = str(tmp_path / "verdicts")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    dedup.write_dedup_index(corpus, cbp)

    def drain():
        src = pipeline.read_file_stream(spark, in_dir, schema=docs.schema)
        q = pipeline.stream_neardup_ingest(src, cbp, sbp, out, ckpt)
        q.awaitTermination()

    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    drain()  # no new input: both sinks unchanged

    got = {
        r["doc_id"]: (r["n_corpus_dups"], r["n_prior_dups"], r["dup"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: (r["n_corpus_dups"], r["n_prior_dups"], r["dup"])
        for r in dedup.neardup_screen(b1.unionByName(b2), corpus).collect()
    }
    assert got == want
    assert len(got) == b1.count() + b2.count()

    stored = {
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in spark.read.parquet(sbp)
        .select("doc_id", "band_idx", "band_hash")
        .collect()
    }
    expect = {
        tuple(r)
        for r in dedup.minhash_bands(b1.unionByName(b2)).collect()
    }
    assert stored == expect


def _ref_bpe(word_freqs, k):
    """Reference greedy BPE (pure Python): returns the merge list the
    engine must reproduce — (rank, l, r, merged, count)."""
    import collections

    cur = collections.Counter()
    for w, f in word_freqs.items():
        cur[tuple("x%02x" % ord(c) for c in w) + ("xw",)] += f
    merges = []
    for rank in range(1, k + 1):
        pc = collections.Counter()
        for syms, f in cur.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (l, r), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, l, r, l + r, c))
        nxt = collections.Counter()
        for syms, f in cur.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += f
        cur = nxt
    return merges


def test_bpe_train_matches_reference_greedy(spark):
    """The regexp-based merge application must equal greedy
    left-to-right BPE — including the run case ('aaaa': (a,a) merges
    positions (1,2)(3,4), not (2,3)) and deterministic tie-breaks."""
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    docs = spark.createDataFrame(
        [(1, "aaaa aa a"), (2, "abab abab baa"), (3, "aaab ba")],
        ["doc_id", "text"],
    )
    wf = {"aaaa": 1, "aa": 1, "a": 1, "abab": 2, "baa": 1, "aaab": 1, "ba": 1}
    want = _ref_bpe(wf, 6)
    got = [tuple(r) for r in t.bpe_train(docs, n_merges=6).collect()]
    assert got == want


@pytest.mark.slow
def test_bpe_train_local_equals_engine_at_256_merges(spark, sf_dir):
    """Round-13 verdict ask #4: the driver-side trainer (built for
    real vocabulary sizes, where the engine-replay form schedules one
    job per merge) must reproduce the engine form's merge list
    EXACTLY at n_merges ≥ 256 — every pair count, every
    (count DESC, l, rt) argmax, every greedy merge application.
    The testdata documents' synthetic vocabulary exhausts at ~105
    merges (every distinct word collapses to one symbol), so the law
    runs over a deterministic rich vocabulary instead: base-26 alpha
    encodings of 0..1499 with varied repeat counts give a pair space
    deep enough for 256+ merges."""
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    def b26(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("a") + r) + s
        return s

    wf = {b26(i): (i % 37) + 1 for i in range(1500)}
    docs = spark.createDataFrame(
        [(i, " ".join([w] * f)) for i, (w, f) in enumerate(wf.items())],
        ["doc_id", "text"],
    ).localCheckpoint(eager=True)
    local = [tuple(r) for r in t.bpe_train_local(docs, n_merges=256).collect()]
    assert len(local) == 256  # the vocabulary must not exhaust early
    assert local == _ref_bpe(wf, 256)
    engine = [tuple(r) for r in t.bpe_train(docs, n_merges=256).collect()]
    assert local == engine


def test_bpe_train_and_count_on_corpus(spark, sf_dir):
    """Corpus-level law: engine merges equal the reference trainer on
    the real word-frequency table, and per-doc counts under the
    learned vocabulary are positive and no larger than the character
    count (merging only ever shrinks)."""
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import text as t
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    wf = {
        r["w"]: r["freq"]
        for r in docs.select(
            F.explode(t._toks("text")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }
    got = [tuple(r) for r in t.bpe_train(docs, n_merges=8).collect()]
    assert got == _ref_bpe(wf, 8)
    merges = [(l, r) for _, l, r, _, _ in got]
    counts = t.bpe_token_count(docs, merges)
    base = docs.select(
        "doc_id",
        (
            F.aggregate(
                F.filter(t._toks("text"), lambda x: x != ""),
                F.lit(0),
                lambda a, w: a + F.length(w) + 1,  # chars + xw marker
            )
        ).alias("n0"),
    )
    joined = counts.join(base, "doc_id").collect()
    assert all(0 < r["n_bpe_tokens"] <= r["n0"] for r in joined if r["n0"] > 0)


def test_quality_perceptron_learns_separable_labels(spark):
    """On a cleanly separable toy corpus (English docs heavy with
    stopwords vs digit-salad docs) three perceptron steps must produce
    weights that score every English doc above every junk doc, with
    deterministic output across re-runs."""
    from real_time_stock_market_data_pipeline__spark.operators import text as t

    rows = [
        (i, "the cat is in the hat and the dog is of the house", "en")
        for i in range(6)
    ] + [(10 + i, "99 1234 5678 000 42 7 77 888", "zh") for i in range(6)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r for r in t.perceptron_quality(docs).collect()}
    en_scores = [out[i]["score"] for i in range(6)]
    zh_scores = [out[10 + i]["score"] for i in range(6)]
    assert min(en_scores) > max(zh_scores)
    assert all(out[i]["predicted"] for i in range(6))
    assert not any(out[10 + i]["predicted"] for i in range(6))
    again = {r["doc_id"]: r for r in t.perceptron_quality(docs).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_curation_verdicts_laws(spark):
    """Composed-pipeline laws on a hand corpus: kept ⇒ every gate
    passed; exact clones keep exactly the min id; the near-dup flag
    marks only the higher id of a candidate pair; benchmark members
    are contaminated; and flags compose (a doc can carry several kill
    reasons at once)."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        curation,
    )

    good = (
        "the quick brown fox jumps over the lazy dog while the calm "
        "river flows through the green valley under a clear morning "
        "sky and birds sing softly in the distance as children walk "
        "slowly to school along the quiet road"
    )
    rows = [
        (1, good),                      # clean keeper
        (2, good.upper()),              # exact clone of 1 (normalized)
        (3, good + " extra tail words"),  # near-dup of 1 (shingles)
        (4, "short junk !!!"),          # fails quality
        (20, "completely different benchmark document " * 8),  # benchmark
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    got = {
        r["doc_id"]: r
        for r in curation.curation_verdicts(
            docs, bench, min_score=0.3, min_words=5
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 20}
    for r in got.values():
        assert r["kept"] == (
            r["passes_quality"]
            and not r["exact_dup"]
            and not r["near_dup"]
            and not r["contaminated"]
        )
    assert not got[1]["exact_dup"] and got[2]["exact_dup"]
    assert not got[1]["near_dup"] and got[3]["near_dup"]
    assert not got[4]["passes_quality"]
    assert got[20]["contaminated"]  # benchmark self-overlap floor
    assert got[1]["kept"]
    assert not any(got[i]["kept"] for i in (2, 3, 4, 20))


def test_stream_dsir_ingest_equals_batch(spark, sf_dir, tmp_path):
    """Streaming DSIR law: build the scoring state on the id-prefix
    half, stream the other half in TWO single-file drains, and the
    indexed probe answers exactly like the batch `dsir_logweights`
    over the full corpus (integer count partials merge exactly under
    any arrival order); a third drain with no new input changes
    nothing (checkpoint + batch-id-keyed partial idempotence)."""
    from real_time_stock_market_data_pipeline__spark.operators import text as t
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    half_a = docs.filter(F.col("doc_id") < n // 2)
    path = str(tmp_path / "dsir")
    t.dsir_write_index(half_a, path)

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    b1 = docs.filter((F.col("doc_id") >= n // 2) & (F.col("doc_id") % 2 == 0))
    b2 = docs.filter((F.col("doc_id") >= n // 2) & (F.col("doc_id") % 2 == 1))

    def drain():
        src = pipeline.read_file_stream(spark, in_dir, schema=docs.schema)
        q = pipeline.stream_dsir_ingest(src, path, ckpt)
        q.awaitTermination()

    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    drain()  # no new input: idempotent no-op

    got = sorted(
        tuple(r) for r in t.dsir_weights_indexed(spark, path).collect()
    )
    want = sorted(tuple(r) for r in t.dsir_logweights(docs).collect())
    assert got == want


@pytest.mark.slow
def test_stream_curation_ingest_equals_batch(spark, sf_dir, tmp_path):
    """Composed streaming-curation law: initialize state with only the
    benchmark digests, stream the corpus in TWO id-ordered drains, and
    the verdict log equals the batch `curation_verdicts` over the full
    corpus (arrival-order min-id semantics == batch min-id semantics
    under monotone ids — including cross-batch exact/near dups); a
    third drain with no new input changes nothing."""
    from real_time_stock_market_data_pipeline__spark.operators import (
        curation,
    )
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    path = str(tmp_path / "state")
    curation.curation_write_state(bench, path, min_score=0.8, min_words=30)

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")

    def drain():
        src = pipeline.read_file_stream(spark, in_dir, schema=docs.schema)
        q = pipeline.stream_curation_ingest(src, path, ckpt)
        q.awaitTermination()

    docs.filter(F.col("doc_id") < n // 2).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    drain()
    docs.filter(F.col("doc_id") >= n // 2).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    drain()
    drain()  # no new input: idempotent no-op

    got = sorted(
        tuple(r)
        for r in curation.curation_verdicts_indexed(spark, path).collect()
    )
    want = sorted(
        tuple(r)
        for r in curation.curation_verdicts(
            docs, bench, min_score=0.8, min_words=30
        ).collect()
    )
    assert got == want
