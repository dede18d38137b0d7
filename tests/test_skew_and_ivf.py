"""Skew-handling operators and the IVF ANN variant.

The salted operators' contract is *result-invariance*: salting changes
the physical distribution only, never the rows. Each test compares the
salted plan against its plain counterpart exactly. The IVF tests pin
the approximation contract: full probe ≡ brute force, partial probe ⊆
assigned cells.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import (
    relational,
    similarity,
)
from real_time_stock_market_data_pipeline__spark.sources.registry import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = relational.salted_agg(ev, ["event_type"], "value", n_salts=16)
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert _rows(salted) == _rows(plain)


def test_salted_agg_two_stage_plan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = relational.salted_agg(ev, ["event_type"], "value", n_salts=16)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # two logical aggregations, each planned as partial+final = 4 nodes
    assert plan.count("HashAggregate") >= 4


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    salted = relational.salted_join(li, orders, ["l_orderkey"], n_salts=8)
    plain = li.join(orders, ["l_orderkey"])
    assert _rows(salted.select(*sorted(salted.columns))) == _rows(
        plain.select(*sorted(plain.columns))
    )


def test_salted_join_left_rows_not_replicated(spark, sf_dir):
    # each left row carries ONE salt: row count matches the plain join
    # even when n_salts changes
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    plain_n = li.join(orders, ["l_orderkey"]).count()
    for n_salts in (1, 4):
        assert (
            relational.salted_join(li, orders, ["l_orderkey"], n_salts).count()
            == plain_n
        )


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in embs.filter(F.col("vec_id") == 3).first()["embedding"]
    ]
    exact = similarity.cosine_topk(embs, q, k=10).collect()
    full_probe = similarity.ivf_topk(
        embs, q, k=10, n_centroids=16, n_probe=16
    ).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in full_probe]


def test_ivf_partial_probe_subset_of_cells(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in embs.filter(F.col("vec_id") == 3).first()["embedding"]
    ]
    cents = similarity.ivf_centroids(embs, 16)
    probes = set(similarity.ivf_query_probes(q, cents, 4))
    assert len(probes) == 4
    got = similarity.ivf_topk(embs, q, k=10, n_probe=4, centroids=cents)
    ids = [r["vec_id"] for r in got.collect()]
    cells = (
        embs.filter(F.col("vec_id").isin(ids))
        .select(similarity.ivf_assign(F.col("embedding"), cents).alias("c"))
        .collect()
    )
    assert {r["c"] for r in cells} <= probes


def test_ivf_assign_deterministic_tiebreak(spark, sf_dir):
    # duplicate centroids → identical sims; lowest cell id must win
    embs = load_table(spark, sf_dir, "embeddings").limit(50)
    cents = similarity.ivf_centroids(embs, 4)
    dup = [cents[0], cents[0], cents[1], cents[1]]
    cells = embs.select(
        similarity.ivf_assign(F.col("embedding"), dup).alias("c")
    ).collect()
    assert {r["c"] for r in cells} <= {0, 2}


def test_ivf_topk_empty_corpus(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings").filter(F.lit(False))
    out = similarity.ivf_topk(embs, [1.0] * 64, k=5)
    assert out.columns == ["vec_id", "cosine"]
    assert out.count() == 0


def test_salted_agg_keys_cover_all_columns(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    salted = relational.salted_agg(ev, ["event_type", "value"], "value")
    plain = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert _rows(salted) == _rows(plain)


def test_approx_actives_within_error_bound(spark, sf_dir):
    """HLL sketch variant stays within ~5x its configured rsd of the
    exact distinct counts (generous bound: rsd is a std-dev, not a
    max), and the shuffle carries sketches, not keys."""
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.05
    exact = {
        (r["window_start"], r["event_type"]): r["active_keys"]
        for r in relational.windowed_distinct_actives(
            ev, "user_id", "ts", "1 hour", "event_type"
        ).collect()
    }
    approx = {
        (r["window_start"], r["event_type"]): r["active_keys"]
        for r in relational.windowed_distinct_actives(
            ev, "user_id", "ts", "1 hour", "event_type", approx_rsd=rsd
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, 5 * rsd * ex), (k, ex, approx[k])


def test_kmeans_step_iterates_with_feedback(spark, sf_dir):
    """The Lloyd loop contract: step output (long form) reshapes into
    the next iteration's centroid list; membership counts always sum to
    the corpus and cells stay in range across iterations."""
    from collections import defaultdict

    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    total = embs.count()
    cents = similarity.ivf_centroids(embs)
    for _ in range(2):
        out = similarity.kmeans_step(embs, cents)
        rows = out.orderBy("cell", "dim").collect()
        by_cell = defaultdict(list)
        counts = {}
        for r in rows:
            by_cell[r["cell"]].append(r["centroid"])
            counts[r["cell"]] = r["n"]
        assert sum(counts.values()) == total
        assert all(0 <= c < similarity.IVF_CENTROIDS_N for c in by_cell)
        assert all(len(v) == len(cents[0]) for v in by_cell.values())
        # non-empty cells feed the next iteration
        cents = [by_cell[c] for c in sorted(by_cell)]
    assert len(cents) >= 2  # clustering didn't collapse to one cell


def test_knn_join_full_probe_equals_per_query_brute_force(spark, sf_dir):
    """With n_probe == n_centroids the cell equi-join sees the whole
    corpus, so each query's top-k must equal cosine_topk for that
    query vector — the exactness anchor for the batched ANN join."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 3)
    out = similarity.ivf_knn_join(
        embs, queries, k=5,
        n_probe=similarity.IVF_CENTROIDS_N,  # probe everything
    )
    got = {
        qid: [(r["nn_id"], round(r["cosine"], 9)) for r in rows]
        for qid, rows in _group_by_query(out.collect()).items()
    }
    for qrow in queries.orderBy("vec_id").collect():
        want = [
            (r["vec_id"], round(r["cosine"], 9))
            for r in similarity.cosine_topk(
                embs, [float(x) for x in qrow["embedding"]], k=5
            ).collect()
        ]
        assert got[qrow["vec_id"]] == want


def _group_by_query(rows):
    from collections import defaultdict

    by_q = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append(r)
    for q in by_q:
        by_q[q].sort(key=lambda r: (-(r["cosine"] or -2), r["nn_id"]))
    return by_q


def test_knn_join_bounded_output_and_no_cartesian(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 4)
    out = similarity.ivf_knn_join(embs, queries, k=3)
    counts = out.groupBy("query_id").count().collect()
    assert 0 < len(counts) <= 4
    assert all(r["count"] <= 3 for r in counts)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_join_empty_corpus_schema(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    empty = embs.filter(F.lit(False))
    out = similarity.ivf_knn_join(empty, embs.limit(2), k=3)
    assert out.columns == ["query_id", "nn_id", "cosine"]
    assert out.count() == 0


def test_ivf_index_at_rest_prunes_and_matches(spark, sf_dir, tmp_path):
    """ivf_write_index + ivf_topk_indexed: the materialized cell layout
    must (a) return exactly ivf_topk's result for the same centroids
    and (b) push the probe predicate into the scan's PartitionFilters —
    at scale the filter skips cell directories, it doesn't read rows."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_index")
    cents = similarity.ivf_write_index(embs, path)
    qrow = embs.filter(F.col("vec_id") == 0).first()
    query = [float(x) for x in qrow["embedding"]]

    indexed = similarity.ivf_topk_indexed(spark, path, query, cents, k=10)
    in_memory = similarity.ivf_topk(embs, query, k=10, centroids=cents)
    assert [tuple(r) for r in indexed.collect()] == [
        tuple(r) for r in in_memory.collect()
    ]
    # sidecar ergonomics: path-only read loads the stored centroids
    from_meta = similarity.ivf_topk_indexed(spark, path, query, k=10)
    assert [tuple(r) for r in from_meta.collect()] == [
        tuple(r) for r in indexed.collect()
    ]

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters:")[1].split("]")[0]


@pytest.mark.slow
def test_ivfpq_index_at_rest_prunes_and_matches(spark, sf_dir, tmp_path):
    """ivfpq_write_index + ivfpq_topk_indexed (round-11 verdict ask
    #1): the materialized (id, codes) @ partitionBy(cell) layout must
    (a) return exactly ivfpq_topk's result for the same codebooks —
    codes are probe-independent because both codebooks train on the
    full corpus — (b) push the probe predicate into the code scan's
    PartitionFilters, and (c) never read the float vector column in
    that scan (ReadSchema is codes-only; floats appear only in the
    rerank scan)."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq_index")
    cents, sds = similarity.ivfpq_write_index(embs, path)
    qrow = embs.filter(F.col("vec_id") == 0).first()
    query = [float(x) for x in qrow["embedding"]]

    indexed = similarity.ivfpq_topk_indexed(
        spark, path, embs, query, cents, sds, k=10, refine=4
    )
    on_the_fly = similarity.ivfpq_topk(
        embs, query, k=10, refine=4, centroids=cents, seeds=sds
    )
    assert [tuple(r) for r in indexed.collect()] == [
        tuple(r) for r in on_the_fly.collect()
    ]
    # sidecar ergonomics: a reader with only the path gets the same
    # result (codebooks from _ivfpq_meta.json), and the repartitioned
    # write leaves one coherent file per cell directory
    import glob
    import os

    from_meta = similarity.ivfpq_topk_indexed(
        spark, path, embs, query, k=10, refine=4
    )
    assert [tuple(r) for r in from_meta.collect()] == [
        tuple(r) for r in indexed.collect()
    ]
    meta = similarity.ivfpq_read_meta(path)
    assert meta["centroids"] == cents and meta["seeds"] == sds
    per_cell = [
        len(glob.glob(os.path.join(path, d, "*.parquet")))
        for d in os.listdir(path)
        if d.startswith("cell=")
    ]
    assert per_cell and max(per_cell) == 1

    # the candidate stage is collected eagerly inside the operator (its
    # ids become the rerank scan's pushed filter), so plan-assert the
    # factored-out frame the operator itself executes
    cand_frame = similarity._ivfpq_candidates(
        spark, path, query, cents, sds, 10, 4, similarity.PQ_M,
        similarity.IVF_PROBES_N, "vec_id",
    )
    plan = cand_frame._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")
    cell_pruned = [seg for seg in pf[1:] if "cell" in seg.split("]")[0]]
    assert cell_pruned, "probe filter did not land in PartitionFilters"
    # the pruned code scan reads integer codes only — no float vectors
    import re

    code_scans = [
        s for s in re.findall(r"ReadSchema: struct<([^>]*)", plan)
        if "c0:int" in s
    ]
    assert code_scans and all("embedding" not in s for s in code_scans)
    # and the rerank's float scan carries the candidate-id pushdown
    # instead of scanning the whole corpus for <= k*refine rows
    rerank_plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[[^\]]*In\(vec_id", rerank_plan)


def test_ivfpq_index_full_probe_equals_pq_topk(spark, sf_dir, tmp_path):
    """With every cell probed, the indexed path degrades to exactly
    pq_topk on the full corpus — the composition law carried over to
    the at-rest form."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 300
    )
    path = str(tmp_path / "ivfpq_index_full")
    cents, sds = similarity.ivfpq_write_index(embs, path)
    qrow = embs.filter(F.col("vec_id") == 1).first()
    query = [float(x) for x in qrow["embedding"]]
    indexed = similarity.ivfpq_topk_indexed(
        spark, path, embs, query, cents, sds, k=5, refine=3,
        n_probe=len(cents),
    )
    flat = similarity.pq_topk(embs, query, k=5, refine=3, seeds=sds)
    assert [tuple(r) for r in indexed.collect()] == [
        tuple(r) for r in flat.collect()
    ]


@pytest.mark.slow
def test_ivfpq_merge_index_incremental_equals_full_build(spark, sf_dir, tmp_path):
    """Incremental ingestion law: build the index on corpus A, merge
    batch B under A's frozen codebooks (from the meta sidecar), and
    the merged index answers exactly like ivfpq_topk over A ∪ B with
    A's codebooks — where a row was encoded cannot show in what was
    stored. Re-merging B is idempotent (MERGE on vec_id)."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings")
    half_a = embs.filter(F.col("vec_id") % 2 == 0)
    half_b = embs.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivfpq_inc")
    cents, sds = similarity.ivfpq_write_index(half_a, path)
    similarity.ivfpq_merge_index(spark, half_b, path)

    qrow = embs.filter(F.col("vec_id") == 0).first()
    query = [float(x) for x in qrow["embedding"]]
    merged = similarity.ivfpq_topk_indexed(
        spark, path, embs, query, k=10, refine=4
    )
    reference = similarity.ivfpq_topk(
        embs, query, k=10, refine=4, centroids=cents, seeds=sds
    )
    want = [tuple(r) for r in reference.collect()]
    assert [tuple(r) for r in merged.collect()] == want

    # idempotence: re-ingesting the same batch changes nothing
    similarity.ivfpq_merge_index(spark, half_b, path)
    again = similarity.ivfpq_topk_indexed(
        spark, path, embs, query, k=10, refine=4
    )
    assert [tuple(r) for r in again.collect()] == want
    n_rows = spark.read.parquet(path).count()
    assert n_rows == embs.count()


@pytest.mark.slow
def test_stream_ivfpq_ingest_equals_full_build(spark, sf_dir, tmp_path):
    """Streaming index-maintenance law: build on the id-prefix half,
    stream the other half in TWO single-file drains, and the index
    answers exactly like ivfpq_topk over the full corpus with the
    prefix codebooks; a third drain with no new input changes nothing
    (checkpoint + MERGE idempotence)."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    embs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = embs.agg(F.max("vec_id")).first()[0] + 1
    half_a = embs.filter(F.col("vec_id") < n // 2)
    path = str(tmp_path / "ivfpq_stream")
    cents, sds = similarity.ivfpq_write_index(half_a, path)

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    b1 = embs.filter(
        (F.col("vec_id") >= n // 2) & (F.col("vec_id") % 2 == 0)
    )
    b2 = embs.filter(
        (F.col("vec_id") >= n // 2) & (F.col("vec_id") % 2 == 1)
    )

    def drain():
        src = pipeline.read_file_stream(spark, in_dir, schema=embs.schema)
        q = pipeline.stream_ivfpq_ingest(src, path, ckpt)
        q.awaitTermination()

    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    drain()  # no new input: idempotent no-op

    qrow = embs.filter(F.col("vec_id") == 0).first()
    query = [float(x) for x in qrow["embedding"]]
    got = similarity.ivfpq_topk_indexed(
        spark, path, embs, query, k=10, refine=4
    )
    want = similarity.ivfpq_topk(
        embs, query, k=10, refine=4, centroids=cents, seeds=sds
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    assert spark.read.parquet(path).count() == embs.count()


@pytest.mark.slow
def test_stream_contrastive_ingest_equals_batch(spark, sf_dir, tmp_path):
    """Streaming contrastive-index law (round-13 verdict stretch #8):
    build the labeled candidate index on the id-prefix half under
    frozen full-corpus centroids, stream the other half in TWO
    single-file drains, and the indexed probe answers exactly like the
    batch `contrastive_pairs` over the full corpus with the same
    centroids; a third drain with no new input changes nothing
    (checkpoint + MERGE idempotence)."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    embs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    n = embs.agg(F.max("vec_id")).first()[0] + 1
    cents = similarity.ivf_centroids(embs)
    half_a = embs.filter(F.col("vec_id") < n // 2)
    path = str(tmp_path / "contr_stream")
    similarity.contrastive_write_index(half_a, path, centroids=cents)

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    b1 = embs.filter(
        (F.col("vec_id") >= n // 2) & (F.col("vec_id") % 2 == 0)
    )
    b2 = embs.filter(
        (F.col("vec_id") >= n // 2) & (F.col("vec_id") % 2 == 1)
    )

    def drain():
        src = pipeline.read_file_stream(spark, in_dir, schema=embs.schema)
        q = pipeline.stream_contrastive_ingest(src, path, ckpt)
        q.awaitTermination()

    b1.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    b2.coalesce(1).write.mode("append").parquet(in_dir)
    drain()
    drain()  # no new input: idempotent no-op

    anchors = embs.filter(F.col("vec_id") < 4)
    got = similarity.contrastive_pairs_indexed(spark, anchors, path, k=3)
    want = similarity.contrastive_pairs(
        embs, anchors, k=3, centroids=cents
    )
    assert sorted(
        (tuple(r) for r in got.collect()), key=lambda t: (t[0], t[2], t[3])
    ) == sorted(
        (tuple(r) for r in want.collect()), key=lambda t: (t[0], t[2], t[3])
    )
    assert spark.read.parquet(path).count() == embs.count()


def test_ivfpq_write_index_empty_corpus_raises(spark, sf_dir, tmp_path):
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = load_table(spark, sf_dir, "embeddings").filter(F.lit(False))
    with pytest.raises(ValueError, match="empty corpus"):
        similarity.ivfpq_write_index(embs, str(tmp_path / "nope"))


def test_embedding_quantize_bounds_and_roundtrip(spark, sf_dir):
    """int8 range respected, scale nonnegative, and the quantized
    reconstruction is within half-a-step per component of the input
    (error bound sqrt(d)·scale/2)."""
    from real_time_stock_market_data_pipeline__spark.operators import similarity
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    out = similarity.embedding_quantize(embs).collect()
    assert out
    for r in out:
        assert r.scale >= 0
        assert r.n_dims == similarity.EMBEDDING_DIM
        # max |err| per dim is scale/2 (+rounding slack), so the l2
        # error is bounded by sqrt(d) * scale/2
        bound = (r.n_dims ** 0.5) * (r.scale / 2) + 1e-6
        assert r.recon_err <= bound
    # a vector already on the int8 grid reconstructs exactly
    toy = spark.createDataFrame(
        [(1, [127.0, -127.0, 0.0, 64.0])], "vec_id long, embedding array<float>"
    )
    r = similarity.embedding_quantize(toy).collect()[0]
    assert r.scale == 1.0 and r.recon_err == 0.0


def test_silhouette_bounds_and_separated_clusters(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_silhouette,
    )
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    rows = q_silhouette(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1 - 1e-9 <= r.mean_silhouette <= 1 + 1e-9
        assert r.n_vectors >= 1
    # two perfectly separated point clusters score ~1
    sep = spark.createDataFrame(
        [(i, "a", [0.0, 0.0]) for i in range(5)]
        + [(i + 10, "b", [100.0, 100.0]) for i in range(5)],
        "vec_id long, label string, embedding array<float>",
    )
    out = {r.label: r for r in similarity.silhouette_by_label(sep).collect()}
    assert out["a"].mean_silhouette > 0.99
    assert out["b"].mean_silhouette > 0.99


def test_pca_pc1_unit_norm_and_invariance(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.pca_power_iteration(embs, n_iter=3)
    rows = out.collect()
    assert len(rows) == 64
    # loadings form (approximately) a unit vector
    norm2 = sum(r.loading**2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-3
    assert all(r.lambda_est > 0 for r in rows)
    # bit-identical under a different input partitioning
    rows2 = similarity.pca_power_iteration(
        embs.repartition(13, "label"), n_iter=3
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pca_pc1_recovers_dominant_axis(spark):
    import random

    from real_time_stock_market_data_pipeline__spark.operators import similarity

    rng = random.Random(7)
    # variance 100x larger along dim 0 than any other
    rows = [
        (i, [rng.gauss(0, 10.0)] + [rng.gauss(0, 0.1) for _ in range(63)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim: r.loading for r in similarity.pca_power_iteration(df, n_iter=3).collect()}
    assert abs(out[0]) > 0.99
    assert all(abs(v) < 0.1 for d, v in out.items() if d != 0)


def test_embedding_outliers_planted_detection(spark):
    import random

    from real_time_stock_market_data_pipeline__spark.operators import similarity

    rng = random.Random(3)
    rows = []
    for i in range(200):
        vec = [rng.gauss(0, 0.05) for _ in range(64)]
        rows.append((i, vec, "a"))
    # planted far-out vector must rank as the #1 outlier
    rows.append((999, [5.0] * 64, "a"))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = similarity.embedding_outliers(df, top_pct=5).collect()
    assert len(out) == 11  # ceil(5% of 201)
    top = min(out, key=lambda r: r.outlier_rank)
    assert top.vec_id == 999 and top.outlier_rank == 1


# ---------------------------------------------------------------------------
# Round-7: JL random projection
# ---------------------------------------------------------------------------


def test_random_projection_deterministic_and_shaped(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = similarity.random_projection(embs, out_dim=16)
    n_vecs = embs.count()
    assert a.count() == 16 * n_vecs
    b = similarity.random_projection(embs, out_dim=16)
    assert a.exceptAll(b).count() == 0  # pure function of the input


def test_random_projection_preserves_norms_on_average(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    proj = similarity.random_projection(embs, out_dim=16)
    pn = proj.groupBy("vec_id").agg(
        F.sum(F.col("component") * F.col("component")).alias("psq")
    )
    on = embs.select(
        "vec_id",
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        ).alias("osq"),
    )
    joined = pn.join(on, "vec_id").select(
        (F.sum("psq") / F.sum("osq")).alias("ratio")
    )
    ratio = joined.collect()[0].ratio
    # E[ratio] = 1 with variance ~2/out_dim per vector, averaged over
    # 50 vectors; a fixed hash makes this a pinned value, not a flake
    assert 0.7 < ratio < 1.3


def test_centroid_similarity_bounds_and_pair_count(spark, sf_dir):
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = embs.select("label").distinct().count()
    rows = similarity.centroid_similarity(embs).collect()
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        assert r.label_a < r.label_b


def test_embedding_dispersion_tight_vs_spread(spark):
    from pyspark.sql import Row

    from real_time_stock_market_data_pipeline__spark.operators import similarity

    def vec(base, eps, i):
        v = [0.0] * 64
        v[base] = 1.0
        v[(base + 1) % 64] = eps * (i + 1)
        return v

    rows = (
        # label 0: nearly identical vectors -> low dispersion
        [Row(vec_id=i, embedding=vec(0, 0.001, i), label=0) for i in range(6)]
        # label 1: widely spread directions -> higher dispersion
        + [Row(vec_id=10 + i, embedding=[1.0 if j == i * 9 else 0.0 for j in range(64)], label=1) for i in range(6)]
    )
    df = spark.createDataFrame(rows)
    out = {r.label: r for r in similarity.embedding_dispersion(df).collect()}
    assert out[0].dispersion < 0.01
    assert out[1].dispersion > out[0].dispersion
    for r in out.values():
        assert -1.0 - 1e-9 <= r.min_cos <= 1.0 + 1e-9
        assert r.mean_cos >= r.min_cos - 1e-9


def test_threshold_calibration_counts_all_bucket_pairs(spark, sf_dir):
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.driver_queries import (
        q_threshold_calibration,
    )
    from real_time_stock_market_data_pipeline__spark.operators import similarity

    hist = q_threshold_calibration(spark, sf_dir).collect()
    assert hist
    total = sum(r.n_pairs for r in hist)
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = similarity.embedding_neardup_pairs(embs, threshold=-2.0).count()
    assert total == pairs  # histogram partitions the candidate pairs
    for r in hist:
        assert -20 <= r.bin <= 20
        assert abs(r.bin_lo - r.bin / 20.0) < 1e-9


def test_ivfpq_full_probe_equals_pq_topk(spark, sf_dir):
    """IVF-PQ composition law: probing every cell reduces the coarse
    filter to a no-op, so the result must equal pq_topk EXACTLY (codes
    are trained on the full corpus in both, so they agree bitwise)."""
    embs = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in embs.filter(F.col("vec_id") == 3).first()["embedding"]
    ]
    pq_only = similarity.pq_topk(embs, q, k=10, refine=4).collect()
    full_probe = similarity.ivfpq_topk(
        embs, q, k=10, refine=4, n_centroids=16, n_probe=16
    ).collect()
    assert [tuple(r) for r in pq_only] == [tuple(r) for r in full_probe]


def test_ivfpq_partial_probe_subset_of_cells(spark, sf_dir):
    """Partial probe: every returned id must live in a probed cell, and
    the empty corpus keeps a stable three-column schema."""
    embs = load_table(spark, sf_dir, "embeddings")
    q = [
        float(x)
        for x in embs.filter(F.col("vec_id") == 3).first()["embedding"]
    ]
    cents = similarity.ivf_centroids(embs, 16)
    probes = set(similarity.ivf_query_probes(q, cents, 4))
    got = similarity.ivfpq_topk(embs, q, k=10, n_probe=4, centroids=cents)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids  # the probed cells contain the query's own neighbourhood
    cells = (
        embs.filter(F.col("vec_id").isin(ids))
        .select(similarity.ivf_assign(F.col("embedding"), cents).alias("c"))
        .collect()
    )
    assert {r["c"] for r in cells} <= probes
    empty = similarity.ivfpq_topk(embs.limit(0), q, k=10)
    assert empty.columns == ["vec_id", "cosine", "approx_cosine"]
    assert empty.count() == 0
