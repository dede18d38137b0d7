"""Embedding similarity: brute/ANN/IVF top-k, kNN join, quantize/outliers, PCA/JL.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """The query point: embedding of vec_id=0 (a plan literal — at
    scale this is a parameter, never a join)."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


# The oracles are static SQL, so they pull the same query vector via a
# scalar cross join on vec_id=0 ("qe") instead of inlined literals.
_DIM = similarity.EMBEDDING_DIM

_Q_SUB = "(SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q"

# Left-associative double addition chains — SQL `+` parses
# left-associative, so ((t1+t2)+t3)+… matches the engine's fold
# bit-for-bit (see similarity._fold_sum). No decimals: DuckDB's
# double→decimal cast rounds through double arithmetic and drifts.
_DOT_QE = " + ".join(
    f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST(qe[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)
_SQ_EMB = " + ".join(
    f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)
_SQ_QE = " + ".join(
    f"CAST(qe[{i + 1}] AS DOUBLE) * CAST(qe[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)

_COSINE_QE = (
    f"CASE WHEN sqrt({_SQ_EMB}) > 0 THEN "
    f"({_DOT_QE}) / (sqrt({_SQ_EMB}) * sqrt({_SQ_QE})) END"
)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.cosine_topk(load_table(spark, sf_dir, "embeddings"), q, k=10)


_COSINE_TOPK_ORACLE = f"""
SELECT vec_id, {_COSINE_QE} AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
ORDER BY cosine DESC NULLS LAST, vec_id
LIMIT 10
"""


def q_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized int8 cosine top-k with exact rerank
    (`operators/similarity.py:sq8_topk`): integer-dot-product scan
    over symmetric-int8 codes (per-vector scales cancel in cosine, so
    the approximate score is exact int64 sums + two sqrts — no float
    accumulation order anywhere), top k·refine candidates broadcast
    back for an exact fold-cosine rerank. The oracle re-derives the
    codes with DuckDB's round() (matched on the Spark/Python side via
    Decimal ROUND_HALF_UP on the exact binary value) and replays both
    ranking stages."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.sq8_topk(
        load_table(spark, sf_dir, "embeddings"), q, k=10, refine=4
    )


_SQ8_DOTQ = " + ".join(f"q[{i + 1}] * qv[{i + 1}]" for i in range(_DIM))
_SQ8_QNC = " + ".join(f"q[{i + 1}] * q[{i + 1}]" for i in range(_DIM))
_SQ8_QNQ = " + ".join(f"qv[{i + 1}] * qv[{i + 1}]" for i in range(_DIM))
_SQ8_DOT_V = " + ".join(
    f"CAST(v[{i + 1}] AS DOUBLE) * CAST(qe[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)
_SQ8_SQ_V = " + ".join(
    f"CAST(v[{i + 1}] AS DOUBLE) * CAST(v[{i + 1}] AS DOUBLE)"
    for i in range(_DIM)
)

_SQ8_TOPK_ORACLE = f"""
WITH qraw AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qq AS (
  SELECT qe, list_transform(qe, x ->
           CAST(round(CAST(x AS DOUBLE) / qscale, 0) AS BIGINT)) AS qv
  FROM (SELECT qe,
          list_max(list_transform(qe, x -> abs(CAST(x AS DOUBLE)))) / 127.0
            AS qscale
        FROM qraw)
),
c AS (
  SELECT vec_id, embedding AS v,
         list_transform(embedding, x -> CASE WHEN scale > 0
             THEN CAST(round(CAST(x AS DOUBLE) / scale, 0) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END) AS q
  FROM (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
            / 127.0 AS scale
        FROM embeddings)
),
sc AS (
  SELECT vec_id, v, ({_SQ8_DOTQ}) AS dotq, ({_SQ8_QNC}) AS qnc,
         ({_SQ8_QNQ}) AS qnq
  FROM c CROSS JOIN qq
),
cand AS (
  SELECT vec_id, v,
         CAST(dotq AS DOUBLE)
           / (sqrt(CAST(qnc AS DOUBLE)) * sqrt(CAST(qnq AS DOUBLE)))
           AS approx
  FROM sc WHERE qnc > 0
  ORDER BY approx DESC NULLS LAST, vec_id
  LIMIT 40
)
SELECT vec_id,
  ({_SQ8_DOT_V}) / (sqrt({_SQ8_SQ_V}) * sqrt({_SQ_QE})) AS cosine,
  {_round_sql("approx", 6)} AS approx_cosine
FROM cand CROSS JOIN qraw
WHERE sqrt({_SQ8_SQ_V}) > 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization cosine top-k with exact rerank
    (`operators/similarity.py:pq_topk`): deterministic lowest-id seed
    codebook quantized to int8 under ONE global scale, per-subspace
    argmin encode (fold-chain squared-L2, ties to the lowest codeword),
    integer ADC lookup-table scoring (the global scales cancel in
    cosine, so every cross-subspace aggregation is an exact int64 sum
    — order-free by construction), then exact broadcast rerank. The
    oracle rebuilds the codebook from the table (ROW_NUMBER over
    vec_id), re-derives the codes with DuckDB round() (matched by
    Decimal ROUND_HALF_UP driver-side), and replays the argmin, the
    ADC sums, and both ranking stages."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.pq_topk(
        load_table(spark, sf_dir, "embeddings"), q, k=10, refine=4
    )


def _pq_topk_oracle(corpus: str = "embeddings", extra_ctes: str = "") -> str:
    """PQ oracle, parameterized so the IVF-PQ composition can replay
    the same encode/ADC/rerank over a probed-cell candidate CTE
    (``corpus``) injected via ``extra_ctes``. The codebook CTEs always
    read the FULL ``embeddings`` table — codes must not depend on
    which cells are probed, matching the engine."""
    m, ksub = similarity.PQ_M, similarity.PQ_KSUB
    dsub = _DIM // m
    k, refine = 10, 4

    def comp(rel: str, i: int) -> str:
        # component i (0-based within subspace) of subspace sp.s
        return f"CAST({rel}[sp.s * {dsub} + {i + 1}] AS DOUBLE)"

    def cw(i: int) -> str:
        # integer codeword component of seed sd at subspace position i
        return f"CAST(round({comp('sd.se', i)} / scs.sc, 0) AS BIGINT)"

    # assignment score replays the engine's ADC identity:
    # (-2 · Σ v_i·rc_i) + Σ rc_i² with rc = sc·round(seed/sc), both
    # sums left-associative chains in subspace element order
    recon = f"(scs.sc * round({{se}} / scs.sc, 0))"
    dot_chain = " + ".join(
        f"{comp('e.embedding', i)} * "
        + recon.format(se=comp("sd.se", i))
        for i in range(dsub)
    )
    n2_chain = " + ".join(
        recon.format(se=comp("sd.se", i))
        + " * "
        + recon.format(se=comp("sd.se", i))
        for i in range(dsub)
    )
    dist_chain = f"({dot_chain}) * (-2.0) + ({n2_chain})"
    lut_dot = " + ".join(
        f"qq.qv[sp.s * {dsub} + {i + 1}] * {cw(i)}" for i in range(dsub)
    )
    lut_n2 = " + ".join(f"{cw(i)} * {cw(i)}" for i in range(dsub))
    qn2 = " + ".join(f"qv[{i + 1}] * qv[{i + 1}]" for i in range(_DIM))
    return f"""
WITH qraw AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qq AS (
  SELECT qe, list_transform(qe, x ->
           CAST(round(CAST(x AS DOUBLE) / qscale, 0) AS BIGINT)) AS qv
  FROM (SELECT qe,
          list_max(list_transform(qe, x -> abs(CAST(x AS DOUBLE)))) / 127.0
            AS qscale
        FROM qraw)
),
seeds AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j, embedding AS se
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {ksub})
),
scs AS (
  SELECT max(abs(CAST(x AS DOUBLE))) / 127.0 AS sc
  FROM (SELECT unnest(se) AS x FROM seeds)
),
sp AS (SELECT unnest(range({m})) AS s),{extra_ctes}
assign AS (
  SELECT e.vec_id, sp.s, sd.j,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id, sp.s
                            ORDER BY ({dist_chain}) ASC, sd.j ASC) AS rn
  FROM {corpus} e CROSS JOIN sp CROSS JOIN seeds sd CROSS JOIN scs
),
luts AS (
  SELECT sp.s, sd.j, ({lut_dot}) AS ldot, ({lut_n2}) AS ln2
  FROM sp CROSS JOIN seeds sd CROSS JOIN scs CROSS JOIN qq
),
adc AS (
  SELECT a.vec_id, sum(l.ldot) AS adot, sum(l.ln2) AS an2
  FROM assign a JOIN luts l ON a.s = l.s AND a.j = l.j
  WHERE a.rn = 1
  GROUP BY a.vec_id
),
qn AS (SELECT ({qn2}) AS qn2 FROM qq),
cand AS (
  SELECT vec_id,
         CAST(adot AS DOUBLE)
           / (sqrt(CAST(an2 AS DOUBLE)) * sqrt(CAST(qn2 AS DOUBLE)))
           AS approx
  FROM adc CROSS JOIN qn
  WHERE an2 > 0
  ORDER BY approx DESC NULLS LAST, vec_id
  LIMIT {k * refine}
)
SELECT e.vec_id, {_COSINE_QE} AS cosine,
       {_round_sql("c.approx", 6)} AS approx_cosine
FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN qraw
WHERE ({_COSINE_QE}) IS NOT NULL
ORDER BY cosine DESC, e.vec_id
LIMIT {k}
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.ann_topk(load_table(spark, sf_dir, "embeddings"), q, k=10)


def _plane_dot_sql(vec: str, plane: list[float]) -> str:
    return " + ".join(
        f"CAST({vec}[{i + 1}] AS DOUBLE) * ({plane[i]!r})"
        for i in range(len(plane))
    )


def _ann_topk_oracle() -> str:
    emb_bits = " || ".join(
        f"(CASE WHEN {_plane_dot_sql('embedding', p)} >= 0 THEN '1' ELSE '0' END)"
        for p in similarity.ANN_PLANES
    )
    qe_bits = " || ".join(
        f"(CASE WHEN {_plane_dot_sql('qe', p)} >= 0 THEN '1' ELSE '0' END)"
        for p in similarity.ANN_PLANES
    )
    return f"""
SELECT vec_id, {_COSINE_QE} AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
WHERE ({emb_bits}) = ({qe_bits})
ORDER BY cosine DESC NULLS LAST, vec_id
LIMIT 10
"""


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    return similarity.embedding_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


def _embedding_neardup_oracle() -> str:
    bits = " || ".join(
        f"(CASE WHEN {_plane_dot_sql('embedding', p)} >= 0 THEN '1' ELSE '0' END)"
        for p in similarity.ANN_PLANES
    )
    dot = " + ".join(
        f"CAST(a.embedding[{i + 1}] AS DOUBLE) * CAST(b.embedding[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )
    na = " + ".join(
        f"CAST(a.embedding[{i + 1}] AS DOUBLE) * CAST(a.embedding[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )
    nb = " + ".join(
        f"CAST(b.embedding[{i + 1}] AS DOUBLE) * CAST(b.embedding[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )
    cos = (
        f"CASE WHEN sqrt({na}) > 0 AND sqrt({nb}) > 0 "
        f"THEN ({dot}) / (sqrt({na}) * sqrt({nb})) END"
    )
    return f"""
WITH bkt AS (SELECT vec_id, embedding, ({bits}) AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ({cos}) >= 0.3
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.ivf_topk(load_table(spark, sf_dir, "embeddings"), q, k=10)


def _coldot_sql(a: str, b: str) -> str:
    """Left-associative column·column dot chain (same fold order as
    similarity._dot_fold, so the doubles agree bitwise)."""
    return " + ".join(
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)"
        for i in range(_DIM)
    )


def _ivf_topk_oracle(n_probe: int | None = None) -> str:
    """IVF in plain SQL: centroids = lowest-id vectors, assignment =
    row_number over (sim DESC, cell ASC) — the same argmax-with-lowest-
    id-tiebreak the engine's array_max-over-(s, -i) computes. sim is
    dot·(1/|c|): the row's own norm is a common factor, so it drops out
    of the argmax, exactly as in similarity.ivf_assign."""
    n_c = similarity.IVF_CENTROIDS_N
    n_p = similarity.IVF_PROBES_N if n_probe is None else int(n_probe)
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    dot_qc = _coldot_sql("q.qe", "c.ce")
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
probes AS (
  SELECT c.cell,
         ROW_NUMBER() OVER (ORDER BY ({dot_qc}) * c.inv DESC, c.cell ASC) AS rn
  FROM centn c CROSS JOIN {_Q_SUB}
)
SELECT vec_id, {_COSINE_QE} AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
WHERE vec_id IN (SELECT a.vec_id FROM assign a
                 WHERE a.rn = 1
                   AND a.cell IN (SELECT p.cell FROM probes p WHERE p.rn <= {n_p}))
ORDER BY cosine DESC NULLS LAST, vec_id
LIMIT 10
"""


def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ cosine top-k (`operators/similarity.py:ivfpq_topk`):
    the coarse quantizer prunes the scan to the query's probed cells,
    then the PQ integer-ADC scan + exact rerank runs only over those
    cells — FAISS IndexIVFPQ's shape, composed from the two
    oracle-checked halves. Both codebooks train on the full corpus,
    so codes are probe-independent; the oracle replays the cell
    filter, the argmin encode, the exact-int ADC sums, and both
    ranking stages."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"), q, k=10, refine=4
    )


def _ivfpq_topk_oracle(n_probe: int | None = None) -> str:
    n_c = similarity.IVF_CENTROIDS_N
    n_p = similarity.IVF_PROBES_N if n_probe is None else int(n_probe)
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    dot_qc = _coldot_sql("q.qe", "c.ce")
    extra = f"""
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
cellasgn AS (
  SELECT e.vec_id, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
cellprobes AS (
  SELECT c.cell,
         ROW_NUMBER() OVER (ORDER BY ({dot_qc}) * c.inv DESC, c.cell ASC) AS rn
  FROM centn c CROSS JOIN {_Q_SUB}
),
candv AS (
  SELECT e.* FROM embeddings e
  WHERE e.vec_id IN (SELECT a.vec_id FROM cellasgn a
                     WHERE a.rn = 1
                       AND a.cell IN (SELECT p.cell FROM cellprobes p
                                      WHERE p.rn <= {n_p}))
),"""
    return _pq_topk_oracle(corpus="candv", extra_ctes=extra)


def q_ivf_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index materialized as a parquet cell-partition layout, then
    probed with partition pruning (PartitionFilters plan-asserted in
    tests) — result identical to ``ivf_topk``, so it shares that
    oracle. The write-then-read happens inside the query, like
    ``partitioned_scan``."""
    import tempfile

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_idx_") + "/index"
    cents = similarity.ivf_write_index(embs, path)
    return similarity.ivf_topk_indexed(
        spark, path, _query_vector(spark, sf_dir), cents, k=10
    )


def q_ivfpq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ index materialized at rest (round-11 verdict ask #1):
    ``(id, c0..c7)`` codes written ``partitionBy("cell")``, then the
    probe filter is partition PRUNING, the ADC scan reads only the
    integer code columns, and the float vectors are touched only by
    the broadcast rerank (PartitionFilters/ReadSchema plan-asserted in
    tests/test_plans.py). Codes are probe-independent (both codebooks
    train on the full corpus), so the result — and the oracle — are
    exactly ``ivfpq_topk``'s. The write-then-read happens inside the
    query, like ``ivf_topk_indexed``."""
    import tempfile

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivfpq_idx_") + "/index"
    cents, sds = similarity.ivfpq_write_index(embs, path)
    return similarity.ivfpq_topk_indexed(
        spark, path, embs, _query_vector(spark, sf_dir), cents, sds,
        k=10, refine=4,
    )


def q_ivfpq_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-PQ ingestion (round-12): build the index on the
    id-prefix half of the corpus, MERGE-ingest the other half under
    the frozen sidecar codebooks (`similarity.ivfpq_merge_index` —
    cell-partition-scoped upsert, ingestion cost tracks batch cell
    volume), then probe the merged index. Because the prefix half
    contains the lowest-id vectors, its codebooks ARE the full-corpus
    codebooks, so the merged index answers exactly like `ivfpq_topk`
    on the full corpus — this query shares that oracle, giving the
    write path driver-level evidence."""
    import tempfile

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    n = embs.count()
    half_a = embs.filter(F.col("vec_id") < n // 2)
    half_b = embs.filter(F.col("vec_id") >= n // 2)
    path = tempfile.mkdtemp(prefix="ivfpq_inc_") + "/index"
    similarity.ivfpq_write_index(half_a, path)
    similarity.ivfpq_merge_index(spark, half_b, path)
    return similarity.ivfpq_topk_indexed(
        spark, path, embs, _query_vector(spark, sf_dir), k=10, refine=4
    )


def q_ann_recall_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of EVERY approximate index family against brute-force
    cosine in one panel — BQ (round-13), LSH, IVF-flat, SQ8, PQ, IVF-PQ (round-12
    completion of the single-index `ann_recall` harness): the
    accuracy/efficiency trade table a 100 TB deployment reads before
    picking its serving index. Each side reuses the registered
    operator; intersections join 10-row frames; the oracle replays
    all five index definitions as isolated nested-WITH subqueries."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    embs = load_table(spark, sf_dir, "embeddings")
    # brute-force ground truth computed ONCE and pinned as a 10-row
    # literal frame: each panel leg joins `bf`, and a lazy plan would
    # re-embed the full brute-force scan (and its giant fold
    # expression) into every leg — k rows is the bounded-collect class
    # (same budget as the codebook fetches)
    bf_plan = similarity.cosine_topk(embs, q, k=10).select("vec_id")
    # the four eager build jobs (brute-force ground truth + the three
    # training collects) are independent of each other: submit them as
    # overlapping Spark jobs (guide §2.6) instead of paying four
    # sequential job latencies. Shared training state is provably
    # result-identical: ivf_topk/ivfpq_topk derive exactly
    # ivf_centroids(embs, IVF_CENTROIDS_N) when centroids=None, and
    # pq_topk/ivfpq_topk derive exactly pq_seeds(embs, PQ_KSUB) when
    # seeds=None — passing the once-computed values in removes the
    # duplicate derivation jobs (one extra ivf_centroids, one extra
    # pq_seeds) without changing a single plan literal.
    bf_rows, mu, cents, sds = _overlap_jobs(
        bf_plan.collect,
        lambda: similarity.bq_dim_means(embs),
        lambda: similarity.ivf_centroids(embs, similarity.IVF_CENTROIDS_N),
        lambda: similarity.pq_seeds(embs, similarity.PQ_KSUB),
    )
    bf = spark.createDataFrame(bf_rows, schema=bf_plan.schema)
    variants = [
        ("bq", lambda: similarity.bq_topk(embs, q, k=10, refine=4, means=mu)),
        ("ivf", lambda: similarity.ivf_topk(embs, q, k=10, centroids=cents)),
        (
            "ivfpq",
            lambda: similarity.ivfpq_topk(
                embs, q, k=10, refine=4, centroids=cents, seeds=sds
            ),
        ),
        ("lsh", lambda: similarity.ann_topk(embs, q, k=10)),
        ("pq", lambda: similarity.pq_topk(embs, q, k=10, refine=4, seeds=sds)),
        ("sq8", lambda: similarity.sq8_topk(embs, q, k=10, refine=4)),
    ]

    # the six panel legs are mutually independent one-row recall
    # probes; the lazy 6-way union re-evaluated every index's full
    # probe plan in one action when the caller ran it (each leg a
    # full-corpus scan + fold at scale). Evaluate them as
    # concurrently-submitted bounded jobs (guide §2.6 — one row per
    # leg, the bf-collect class) and return the rows pinned in the
    # fixed variant order: same rows, same schema, same oracle (the
    # round-17 ann_recall_sweep treatment; per-index plan evidence
    # lives with the registered standalone index queries).
    def run_leg(item):
        name, mk = item
        df = mk()
        row = (
            bf.join(df.select("vec_id"), "vec_id")
            .agg(F.count(F.lit(1)).alias("n_match"))
            .select(
                F.lit(name).alias("index_name"),
                F.lit(10).alias("k"),
                "n_match",
                F.round(F.col("n_match").cast("double") / 10.0, 4).alias(
                    "recall_at_k"
                ),
            )
        )
        return row.schema, row.collect()

    from concurrent.futures import ThreadPoolExecutor

    from real_time_stock_market_data_pipeline__spark.sinks import (
        thread_inheriting_wrapper,
    )

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(
            pool.map(thread_inheriting_wrapper()(run_leg), variants)
        )
    rows = [r for _, leg_rows in results for r in leg_rows]
    return spark.createDataFrame(rows, schema=results[0][0])


def _ann_recall_panel_oracle() -> str:
    def sub(sql: str) -> str:
        # each index oracle runs in its own nested-WITH scope so CTE
        # names (cent, qq, ...) cannot collide across definitions
        return f"SELECT vec_id FROM ({sql}) t"

    rows = "\n  UNION ALL\n".join(
        f"""  SELECT '{name}' AS index_name, 10 AS k,
         count(*) AS n_match,
         round(CAST(count(*) AS DOUBLE) / 10.0, 4) AS recall_at_k
  FROM bf JOIN {name}_ids USING (vec_id)"""
        for name in ("bq", "ivf", "ivfpq", "lsh", "pq", "sq8")
    )
    return f"""
WITH bf AS ({_COSINE_TOPK_ORACLE}),
bq_ids AS ({sub(_bq_topk_oracle())}),
ivf_ids AS ({sub(_ivf_topk_oracle())}),
ivfpq_ids AS ({sub(_ivfpq_topk_oracle())}),
lsh_ids AS ({sub(_ann_topk_oracle())}),
pq_ids AS ({sub(_pq_topk_oracle())}),
sq8_ids AS ({sub(_SQ8_TOPK_ORACLE)})
SELECT * FROM (
{rows}
)
"""


#: the recall-vs-cost sweep grid (round-13 verdict ask #6): the probe
#: knob each index family trades accuracy against scan cost with —
#: n_probe for the IVF families (cells scanned), candidate depth
#: (k·refine Hamming survivors) for BQ.
_SWEEP_GRID: tuple[tuple[str, str, tuple[int, ...]], ...] = (
    ("ivf", "n_probe", (1, 2, 4, 8)),
    ("ivfpq", "n_probe", (1, 2, 4, 8)),
    ("bq", "refine", (1, 2, 4, 8)),
)


def q_ann_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 as a function of each index family's cost knob — the
    curve (not the single point `ann_recall_panel` reports) a 100 TB
    deployment reads to SIZE its serving index: IVF-flat and IVF-PQ
    swept over n_probe ∈ {{1,2,4,8}} (fraction of cells scanned), BQ
    over refine ∈ {{1,2,4,8}} (Hamming candidate depth k·refine).
    Every cell reuses the registered operator; intersections join
    10-row frames; the oracle replays all 12 index definitions as
    isolated nested-WITH subqueries with the same knob values.

    Shared-index sweep (round-15 verdict ask #5): codes, codebooks
    and signatures are all PROBE-KNOB-INDEPENDENT (trained/packed on
    the full corpus — see ``ivfpq_write_index``), so each family
    builds ONE temp at-rest index and probes it once per knob value
    instead of re-deriving state per leg: the on-the-fly form
    re-trained both IVF-PQ codebooks and re-encoded the corpus 4×,
    re-assigned every vector to its IVF cell 4×, and re-packed every
    signature 4× — for identical results (``*_topk_indexed`` ≡
    on-the-fly is law-tested per family). Rows and oracle are
    unchanged; the indexed probes additionally turn the IVF cell
    filters into partition pruning."""
    import tempfile

    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    embs = load_table(spark, sf_dir, "embeddings")
    # ONE brute-force pass, pinned as a 10-row literal frame: a lazy
    # `bf` would re-embed the full-corpus brute-force subtree into all
    # 12 sweep legs (12 extra corpus scans + 12 copies of the fold
    # expression in one plan) — k rows is the bounded-collect class
    bf_plan = similarity.cosine_topk(embs, q, k=10).select("vec_id")
    cents = similarity.ivf_centroids(embs, similarity.IVF_CENTROIDS_N)
    tmp = tempfile.mkdtemp(prefix="ann_sweep_")
    # the four remaining eager build jobs (brute-force ground truth +
    # the three at-rest index writes, which target independent temp
    # dirs) overlap as concurrent Spark jobs (guide §2.6): only the
    # cents collect must precede them (two writers consume it)
    bf_rows, (_, seeds), _, _ = _overlap_jobs(
        bf_plan.collect,
        lambda: similarity.ivfpq_write_index(
            embs, f"{tmp}/ivfpq", centroids=cents
        ),
        lambda: similarity.ivf_write_index(
            embs, f"{tmp}/ivf", centroids=cents
        ),
        lambda: similarity.bq_write_index(embs, f"{tmp}/bq"),
    )
    bf = spark.createDataFrame(bf_rows, schema=bf_plan.schema)

    def leg(name: str, param: str, v: int) -> DataFrame:
        if name == "ivf":
            df = similarity.ivf_topk_indexed(
                spark, f"{tmp}/ivf", q, centroids=cents, k=10,
                n_probe=v,
            )
        elif name == "ivfpq":
            df = similarity.ivfpq_topk_indexed(
                spark, f"{tmp}/ivfpq", embs, q, centroids=cents,
                seeds=seeds, k=10, refine=4, n_probe=v,
            )
        else:
            df = similarity.bq_topk_indexed(
                spark, embs, f"{tmp}/bq", q, k=10, refine=v
            )
        return (
            bf.join(df.select("vec_id"), "vec_id")
            .agg(F.count(F.lit(1)).alias("n_match"))
            .select(
                F.lit(name).alias("index_name"),
                F.lit(param).alias("param"),
                F.lit(v).alias("param_value"),
                F.lit(10).alias("k"),
                "n_match",
                F.round(
                    F.col("n_match").cast("double") / 10.0, 4
                ).alias("recall_at_k"),
            )
        )

    # the 12 sweep legs are mutually independent one-row probes of the
    # three at-rest indexes; 8 of them additionally carry an eager
    # bounded candidate collect (ivfpq/bq `*_topk_indexed`). Round 16
    # constructed the legs concurrently but still returned their lazy
    # 12-way union — ONE action that re-evaluated all 12 probe plans
    # (12 whole-stage-codegen spans + 12 pruned index scans + 12 bf
    # joins) when the caller ran it. Round 17 (verdict ask #7):
    # evaluate each leg as a concurrently-submitted bounded job (one
    # recall row per leg — the same bounded-collect class as the bf
    # ground truth) and return the 12 rows pinned as a literal frame
    # in grid order. Rows, schema and oracle are unchanged. The
    # per-leg PartitionFilters/ReadSchema evidence stays committed:
    # the registered `*_topk_indexed` family queries carry the same
    # probe plans in PLANS.md, and representative leg plans are
    # dumped at plans/r17/ann_recall_sweep_leg_*.txt.
    grid = [
        (name, param, v)
        for name, param, values in _SWEEP_GRID
        for v in values
    ]
    from concurrent.futures import ThreadPoolExecutor

    from real_time_stock_market_data_pipeline__spark.sinks import (
        thread_inheriting_wrapper,
    )

    def run_leg(g):
        df = leg(*g)
        return df.schema, df.collect()

    with ThreadPoolExecutor(max_workers=6) as pool:
        results = list(
            pool.map(thread_inheriting_wrapper()(run_leg), grid)
        )
    schema = results[0][0]
    rows = [r for _, leg_rows in results for r in leg_rows]
    return spark.createDataFrame(rows, schema=schema)


def _ann_recall_sweep_oracle() -> str:
    def sub(sql: str) -> str:
        return f"SELECT vec_id FROM ({sql}) t"

    def leg(name: str, param: str, v: int, sql: str) -> str:
        return f"""  SELECT '{name}' AS index_name, '{param}' AS param,
         {v} AS param_value, 10 AS k, count(*) AS n_match,
         round(CAST(count(*) AS DOUBLE) / 10.0, 4) AS recall_at_k
  FROM bf JOIN ({sub(sql)}) {name}_{v}_ids USING (vec_id)"""

    legs = []
    for name, param, values in _SWEEP_GRID:
        for v in values:
            if name == "ivf":
                sql = _ivf_topk_oracle(n_probe=v)
            elif name == "ivfpq":
                sql = _ivfpq_topk_oracle(n_probe=v)
            else:
                sql = _bq_topk_oracle(refine=v)
            legs.append(leg(name, param, v, sql))
    rows = "\n  UNION ALL\n".join(legs)
    return f"""
WITH bf AS ({_COSINE_TOPK_ORACLE})
SELECT * FROM (
{rows}
)
"""


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN: top-3 corpus neighbors for each of the 4 lowest-id
    query vectors via the IVF cell equi-join (never a cartesian). The
    oracle replays cell assignment, per-query probe ranking, the cell
    join, and the per-query row_number top-k in SQL."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 4)
    return similarity.ivf_knn_join(embs, queries, k=3)


def _knn_join_oracle() -> str:
    n_c = similarity.IVF_CENTROIDS_N
    n_p = similarity.IVF_PROBES_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    dot_qc = _coldot_sql("q.qe", "c.ce")
    dot_eq = _coldot_sql("e.embedding", "p.qe")
    ne = _coldot_sql("e.embedding", "e.embedding")
    nq = _coldot_sql("p.qe", "p.qe")
    cos = (
        f"CASE WHEN sqrt({ne}) > 0 AND sqrt({nq}) > 0 "
        f"THEN ({dot_eq}) / (sqrt({ne}) * sqrt({nq})) END"
    )
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, e.embedding, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
corpus AS (SELECT vec_id, embedding, cell FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4),
qp AS (
  SELECT query_id, qe, cell FROM (
    SELECT q.query_id, q.qe, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY ({dot_qc}) * c.inv DESC, c.cell ASC) AS rn
    FROM q CROSS JOIN centn c
  ) WHERE rn <= {n_p}
),
cand AS (
  SELECT p.query_id, e.vec_id AS nn_id, {cos} AS cosine
  FROM qp p JOIN corpus e ON p.cell = e.cell
)
SELECT query_id, nn_id, cosine FROM (
  SELECT query_id, nn_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC NULLS LAST, nn_id) AS rn
  FROM cand
) WHERE rn <= 3
"""


def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One declarative Lloyd iteration seeded with the IVF coarse
    quantizer (16 lowest-id vectors): nearest-centroid assignment is a
    map-side fold, the centroid update a partially-aggregated groupBy.
    The oracle replays assignment (row_number argmax with the same
    tiebreak) and the quantized-mean update in SQL."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(embs)
    return similarity.kmeans_step(embs, cents)


def _kmeans_step_oracle() -> str:
    n_c = similarity.IVF_CENTROIDS_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, e.embedding, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
members AS (SELECT cell, embedding FROM assign WHERE rn = 1)
SELECT cell, i AS dim,
       CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS centroid,
       count(*) AS n
FROM members, unnest(range(1, 65)) AS t(i)
GROUP BY cell, i
"""


def q_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL iterative k-means trainer
    (`operators/similarity.py:kmeans_centroids` — the 100 TB seeding
    path of the semantic family), driver-verified end-to-end rather
    than one step at a time: md5-hash-ordered seeds (partitioning-
    invariant, unlike lowest-id seeds), TWO Lloyd iterations (each one
    scan + a |cells|×dims decimal-partial shuffle + a bounded K×d
    collect), empty cells keeping their previous centroid, then the
    final assignment/update step under the trained centroids. The
    oracle unrolls all three assignment rounds: every quantized
    coordinate mean, every keep-old coalesce, every argmax tiebreak
    replayed bit-for-bit (the doubles the engine collects per
    iteration are the exact doubles the SQL recomputes — proven by
    the hash match)."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(embs, n_iters=2)
    return similarity.kmeans_step(embs, cents)


def _kmeans_train_oracle(n_iters: int = 2) -> str:
    n_c = similarity.IVF_CENTROIDS_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    step = """
a{k} AS (
  SELECT e.vec_id, e.embedding, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN
       (SELECT c.cell, c.ce, {inv} AS inv FROM cents{p} c) c
),
s{k} AS (
  SELECT cell, i AS dim,
         CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS centroid,
         count(*) AS n
  FROM (SELECT cell, embedding FROM a{k} WHERE rn = 1),
       unnest(range(1, {d1})) AS t(i)
  GROUP BY cell, i
)"""
    upd = """
cents{k} AS (
  SELECT p.cell, COALESCE(g.ce, p.ce) AS ce
  FROM cents{p} p LEFT JOIN
       (SELECT cell, list(centroid ORDER BY dim) AS ce
        FROM s{k} GROUP BY cell) g ON p.cell = g.cell
)"""
    parts = [
        f"""seeds AS (
  SELECT md5(CAST(vec_id AS VARCHAR)) AS sk, vec_id, embedding
  FROM embeddings ORDER BY sk, vec_id LIMIT {n_c}
),
cents0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY sk, vec_id) - 1 AS cell,
         embedding AS ce
  FROM seeds
)"""
    ]
    for k in range(1, n_iters + 2):
        parts.append(
            step.format(k=k, p=k - 1, dot=dot_ec, inv=inv, d1=_DIM + 1)
        )
        if k <= n_iters:
            parts.append(upd.format(k=k, p=k - 1))
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT cell, dim, centroid, n FROM s{n_iters + 1}
"""


def q_synthetic_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 deterministic generator (`stream_data_producer.py:73-110`
    contract: per-symbol daily OHLCV with high ≥ max(open, close) ≥
    min(open, close) ≥ low). The generator derives all entropy from
    md5("<id>:<seed>:<salt>") and builds prices in integer cents, so
    the DuckDB oracle replays it bit-identically — this was the one
    registered query without an oracle through round 5."""
    from real_time_stock_market_data_pipeline__spark.sources.external import (
        synthetic_ohlcv,
    )

    ensure_engine_conf(spark)
    return synthetic_ohlcv(spark, days=30)


# Replays sources/external.py:synthetic_ohlcv(days=30, seed=42,
# base=100.0) exactly: same md5 keys, same integer-cent arithmetic,
# same final /100.0 double division (bit-identical IEEE in both
# engines because every operand is an exact integer).
_SYNTHETIC_OHLCV_ORACLE = """
WITH g AS (SELECT id FROM range(150) t(id)),
h AS (
  SELECT id,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:o'), 1, 8) AS BIGINT) AS ho,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:s'), 1, 8) AS BIGINT) AS hs,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:c'), 1, 8) AS BIGINT) AS hc,
    CAST('0x' || substr(md5(CAST(id AS VARCHAR) || ':42:v'), 1, 8) AS BIGINT) AS hv
  FROM g
),
c AS (
  SELECT id,
    10000 + ho % 10000 AS o_c,
    hs % 500 AS s_c,
    10000 + ho % 10000 + hc % 1000 - 500 AS c_c,
    hv % 1000000 + 1000 AS volume
  FROM h
)
SELECT
  list_extract(['AAPL','MSFT','GOOG','AMZN','TSLA'],
               CAST(id % 5 AS INT) + 1) AS symbol,
  DATE '2024-01-01' + CAST(id // 5 AS INT) AS "date",
  o_c / 100.0 AS open,
  (greatest(o_c, c_c) + s_c) / 100.0 AS high,
  (least(o_c, c_c) - s_c) / 100.0 AS low,
  c_c / 100.0 AS close,
  volume
FROM c
"""


def q_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-UDF scale path. By contract it returns the same top-k as
    ``cosine_topk``; NumPy's BLAS dot accumulates in a different order
    than the SQL fold, so the last ulp can differ — the registered
    projection quantizes the cosine at 6 digits (as does the oracle),
    making the equality oracle-checkable without promising bitwise
    float identity."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    out = similarity.cosine_topk_fast(
        load_table(spark, sf_dir, "embeddings"), q, k=10, rank_digits=6
    )
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


# Ranks on the 6-digit-quantized cosine (ties → vec_id) on BOTH sides,
# so a near-tie at the rank-k boundary cannot produce a member-set
# mismatch between NumPy-BLAS and SQL-fold summation orders.
_COSINE_TOPK_FAST_ORACLE = f"""
SELECT vec_id, round({_COSINE_QE}, 6) AS cosine
FROM embeddings CROSS JOIN {_Q_SUB}
ORDER BY round({_COSINE_QE}, 6) DESC NULLS LAST, vec_id
LIMIT 10
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style pruned corpus: IVF-cell-scoped cosine duplicates,
    keep the lowest-(centroid_sim, id) member of every duplicate
    relation (`operators/similarity.py:semantic_dedup`). The oracle
    replays the cell assignment (ROW_NUMBER over the same sim chain),
    the per-row centroid cosine, and the dominance anti-join as a
    NOT EXISTS."""
    ensure_engine_conf(spark)
    return similarity.semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), threshold=0.3
    )


def _semantic_cos_ab() -> str:
    dot_ab = _coldot_sql("a.embedding", "b.embedding")
    sq_a = _coldot_sql("a.embedding", "a.embedding")
    sq_b = _coldot_sql("b.embedding", "b.embedding")
    return (
        f"CASE WHEN sqrt({sq_a}) > 0 AND sqrt({sq_b}) > 0 "
        f"THEN ({dot_ab}) / (sqrt({sq_a}) * sqrt({sq_b})) END"
    )


def _semantic_assign_ctes(src: str) -> str:
    """The cent/centn/assign/asg CTE block replaying
    `similarity._semantic_assign` over relation ``{src}`` (centroids
    always come from ``{src}`` itself for the one-corpus query; the
    incremental oracle overrides with its own cent block)."""
    n_c = similarity.IVF_CENTROIDS_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    sq_e = _coldot_sql("e.embedding", "e.embedding")
    return f"""cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM {src} ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, e.embedding, c.cell,
         CASE WHEN sqrt({sq_e}) > 0
              THEN (({dot_ec}) * c.inv) / sqrt({sq_e}) END AS centroid_sim,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM {src} e CROSS JOIN centn c
),
asg AS (SELECT vec_id, embedding, cell, centroid_sim FROM assign WHERE rn = 1)"""


def _semantic_dedup_oracle() -> str:
    cos_ab = _semantic_cos_ab()
    return f"""
WITH {_semantic_assign_ctes("embeddings")}
SELECT a.vec_id, a.cell, a.centroid_sim
FROM asg a
WHERE NOT EXISTS (
  SELECT 1 FROM asg b
  WHERE b.cell = a.cell
    AND (b.centroid_sim < a.centroid_sim
         OR (b.centroid_sim = a.centroid_sim AND b.vec_id < a.vec_id))
    AND ({cos_ab}) >= 0.3
)
"""


def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-once screen: embeddings with vec_id % 4 == 0 are the NEW
    batch, the rest the existing corpus
    (`operators/similarity.py:semantic_dedup_incremental`). The oracle
    replays corpus-seeded cells, the any-stored-duplicate screen, and
    the intra-batch dominance rule over the survivors.

    Runs the operator's at-rest form (round 17, fresh per-run temp
    dir — nothing reused across runs): the lazy plan instantiated the
    new-batch assign subtree 8× and the corpus assign 4× (12 parquet
    scans / 22 exchanges, the registry's heaviest static plan); the
    at-rest form computes each assignment once, prunes the corpus
    read to the batch's touched cells (PartitionFilters), and
    dominance-prunes over the materialized survivors. Same rows —
    the oracle replays the unmaterialized definition."""
    import tempfile

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup_incremental(
        embs.filter(F.col("vec_id") % 4 == 0),
        embs.filter(F.col("vec_id") % 4 != 0),
        threshold=0.3,
        work_dir=tempfile.mkdtemp(prefix="semdd_inc_"),
    )


def _semantic_dedup_incremental_oracle() -> str:
    # Reuse the assign CTE block with the corpus as the centroid and
    # assignment source, then assign the new batch against the SAME
    # centn (swap the `{src} e` scan of the shared block by writing the
    # new-batch assignment inline).
    cos_ab = _semantic_cos_ab()
    sq_e = _coldot_sql("e.embedding", "e.embedding")
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    ctes = _semantic_assign_ctes("corpus")
    return f"""
WITH corpus AS (SELECT * FROM embeddings WHERE vec_id % 4 <> 0),
newb AS (SELECT * FROM embeddings WHERE vec_id % 4 = 0),
{ctes},
assign_n AS (
  SELECT e.vec_id, e.embedding, c.cell,
         CASE WHEN sqrt({sq_e}) > 0
              THEN (({dot_ec}) * c.inv) / sqrt({sq_e}) END AS centroid_sim,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM newb e CROSS JOIN centn c
),
asg_n AS (SELECT vec_id, embedding, cell, centroid_sim FROM assign_n WHERE rn = 1),
surv AS (
  SELECT a.* FROM asg_n a
  WHERE NOT EXISTS (
    SELECT 1 FROM asg b
    WHERE b.cell = a.cell AND ({cos_ab}) >= 0.3
  )
)
SELECT a.vec_id, a.cell, a.centroid_sim
FROM surv a
WHERE NOT EXISTS (
  SELECT 1 FROM surv b
  WHERE b.cell = a.cell
    AND (b.centroid_sim < a.centroid_sim
         OR (b.centroid_sim = a.centroid_sim AND b.vec_id < a.vec_id))
    AND ({cos_ab}) >= 0.3
)
"""


def q_bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary sign-quantized cosine top-k with exact rerank
    (`operators/similarity.py:bq_topk`): 1-bit-per-dimension sign
    signatures (threshold = decimal-exact per-dimension corpus mean)
    packed into two 32-bit integer lanes, XOR+popcount Hamming scan,
    top k*refine candidates broadcast back for the exact fold-cosine
    rerank. Pure integer candidate stage — the oracle re-derives the
    thresholds with the same decimal-exact average, repacks the
    signatures (including the query's, from the vec_id=0 row), and
    replays both ranking stages bit-for-bit."""
    ensure_engine_conf(spark)
    q = _query_vector(spark, sf_dir)
    return similarity.bq_topk(
        load_table(spark, sf_dir, "embeddings"), q, k=10, refine=4
    )


def _bq_topk_oracle(k: int = 10, refine: int = 4) -> str:
    lb = similarity.BQ_LANE_BITS
    mu_cols = ",\n         ".join(
        f"CAST(sum(CAST(CAST(embedding[{j + 1}] AS DOUBLE)"
        f" AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS m{j}"
        for j in range(_DIM)
    )

    def lane(li: int) -> str:
        return " + ".join(
            f"CASE WHEN CAST(e.embedding[{li * lb + j + 1}] AS DOUBLE)"
            f" > mu.m{li * lb + j}"
            f" THEN CAST({1 << j} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
            for j in range(lb)
        )

    dot_eq = _coldot_sql("e.embedding", "q.qe")
    sq_e = _coldot_sql("e.embedding", "e.embedding")
    return f"""
WITH mu AS (SELECT {mu_cols} FROM embeddings),
sig AS (
  SELECT e.vec_id, ({lane(0)}) AS sig0, ({lane(1)}) AS sig1
  FROM embeddings e CROSS JOIN mu
),
qsig AS (SELECT sig0 AS q0, sig1 AS q1 FROM sig WHERE vec_id = 0),
cand AS (
  SELECT s.vec_id,
         CAST(CAST(bit_count(xor(s.sig0, t.q0)) AS BIGINT)
              + CAST(bit_count(xor(s.sig1, t.q1)) AS BIGINT) AS INT)
           AS hamming
  FROM sig s CROSS JOIN qsig t
  ORDER BY hamming ASC, s.vec_id
  LIMIT {k * refine}
)
SELECT e.vec_id,
       ({dot_eq}) / (sqrt({sq_e}) * sqrt({_SQ_QE})) AS cosine,
       c.hamming
FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id CROSS JOIN {_Q_SUB}
WHERE sqrt({sq_e}) > 0
ORDER BY cosine DESC, e.vec_id
LIMIT {k}
"""


def q_bq_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary signatures materialized at rest
    (`operators/similarity.py:bq_write_index` / `bq_topk_indexed`):
    the Hamming scan reads a three-integer-column table (8 signature
    bytes/vector), floats touched only by the rerank. Signatures are
    query-independent, so the result — and the oracle — are exactly
    `bq_topk`'s; the write-then-read happens inside the query, like
    `ivf_topk_indexed`."""
    import tempfile

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="bq_idx_") + "/index"
    similarity.bq_write_index(embs, path)
    return similarity.bq_topk_indexed(spark, embs, path, _query_vector(spark, sf_dir), k=10, refine=4)


def q_stream_bq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming BQ signature-index maintenance
    (`streaming/pipeline.py:stream_bq_ingest`): thresholds are trained
    on the FULL corpus (the frozen-quantizer policy — means are a
    modeling choice the builder passes explicitly, like the semantic
    screen's codebook), the index is built from the id-prefix half,
    the other half streams in and MERGEs its signature rows per batch,
    then the merged index is probed. Signatures are threshold- and
    arrival-order-independent, so the probe answers exactly like
    `bq_topk` on the full corpus — shares that oracle (the
    `ivfpq_merge_topk` pattern)."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    mu = similarity.bq_dim_means(embs)
    n = embs.count()
    half_a = embs.filter(F.col("vec_id") < n // 2)
    half_b = embs.filter(F.col("vec_id") >= n // 2)
    tmp = tempfile.mkdtemp(prefix="bq_stream_q_")
    path = f"{tmp}/index"
    # two independent setup writes (prefix-half signature index,
    # stream input file) overlap as concurrent jobs (guide §2.6)
    _overlap_jobs(
        lambda: similarity.bq_write_index(half_a, path, means=mu),
        lambda: half_b.coalesce(1).write.parquet(f"{tmp}/in"),
    )
    src = pipeline.read_file_stream(spark, f"{tmp}/in")
    q = pipeline.stream_bq_ingest(src, path, f"{tmp}/ckpt")
    q.awaitTermination()
    return similarity.bq_topk_indexed(
        spark, embs, path, _query_vector(spark, sf_dir), k=10, refine=4
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (`operators/similarity.py:hard_negatives`):
    top-3 nearest WRONG-label corpus vectors for each of the 4
    lowest-id anchors via the IVF cell equi-join, label filter BEFORE
    the per-anchor top-k. The oracle replays assignment, probes, the
    label-mismatch/self-exclusion filter, and the windowed top-k."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    anchors = embs.filter(F.col("vec_id") < 4)
    return similarity.hard_negatives(embs, anchors, k=3)


def _hard_negatives_oracle() -> str:
    n_c = similarity.IVF_CENTROIDS_N
    n_p = similarity.IVF_PROBES_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    dot_qc = _coldot_sql("q.qe", "c.ce")
    dot_eq = _coldot_sql("e.embedding", "p.qe")
    ne = _coldot_sql("e.embedding", "e.embedding")
    nq = _coldot_sql("p.qe", "p.qe")
    cos = (
        f"CASE WHEN sqrt({ne}) > 0 AND sqrt({nq}) > 0 "
        f"THEN ({dot_eq}) / (sqrt({ne}) * sqrt({nq})) END"
    )
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, e.embedding, e.label, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
corpus AS (SELECT vec_id, embedding, label, cell FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, label AS ql, embedding AS qe
      FROM embeddings WHERE vec_id < 4),
qp AS (
  SELECT query_id, ql, qe, cell FROM (
    SELECT q.query_id, q.ql, q.qe, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY ({dot_qc}) * c.inv DESC, c.cell ASC) AS rn
    FROM q CROSS JOIN centn c
  ) WHERE rn <= {n_p}
),
cand AS (
  SELECT p.query_id, p.ql AS anchor_label, e.vec_id AS nn_id,
         e.label AS negative_label, {cos} AS cosine
  FROM qp p JOIN corpus e ON p.cell = e.cell
  WHERE e.label <> p.ql AND e.vec_id <> p.query_id
)
SELECT query_id, anchor_label, nn_id, negative_label, cosine FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC NULLS LAST, nn_id) AS rn
  FROM cand
) WHERE rn <= 3
"""


def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining
    (`operators/similarity.py:contrastive_pairs`): top-3 hard
    positives (same label) AND top-3 hard negatives (different label)
    per anchor from one IVF candidate pass. The oracle replays
    assignment, probes, the self/NULL exclusion, the pair_type CASE,
    and both per-(anchor, type) windows."""
    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    anchors = embs.filter(F.col("vec_id") < 4)
    return similarity.contrastive_pairs(embs, anchors, k=3)


def q_stream_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming contrastive-candidate index maintenance
    (`streaming/pipeline.py:stream_contrastive_ingest`): centroids are
    trained on the FULL corpus (the frozen-quantizer policy), the
    labeled candidate index is built from the id-prefix half, the
    other half streams in and MERGEs cell-scoped, then the merged
    index is probed for the same 4 anchors as `contrastive_pairs`.
    Cell assignment is arrival-order independent under frozen
    centroids, so the probe answers exactly like the batch operator on
    the full corpus — shares that oracle (the `stream_bq_topk`
    pattern)."""
    import tempfile

    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    ensure_engine_conf(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    cents = similarity.ivf_centroids(embs)
    n = embs.count()
    half_a = embs.filter(F.col("vec_id") < n // 2)
    half_b = embs.filter(F.col("vec_id") >= n // 2)
    tmp = tempfile.mkdtemp(prefix="contr_stream_q_")
    path = f"{tmp}/index"
    # two independent setup writes (prefix-half index build, stream
    # input file) overlap as concurrent jobs (guide §2.6)
    _overlap_jobs(
        lambda: similarity.contrastive_write_index(
            half_a, path, centroids=cents
        ),
        lambda: half_b.coalesce(1).write.parquet(f"{tmp}/in"),
    )
    src = pipeline.read_file_stream(spark, f"{tmp}/in")
    q = pipeline.stream_contrastive_ingest(src, path, f"{tmp}/ckpt")
    q.awaitTermination()
    anchors = embs.filter(F.col("vec_id") < 4)
    return similarity.contrastive_pairs_indexed(spark, anchors, path, k=3)


def _contrastive_pairs_oracle() -> str:
    n_c = similarity.IVF_CENTROIDS_N
    n_p = similarity.IVF_PROBES_N
    sq_ce = _coldot_sql("c.ce", "c.ce")
    inv = f"CASE WHEN sqrt({sq_ce}) > 0 THEN 1.0 / sqrt({sq_ce}) ELSE 0.0 END"
    dot_ec = _coldot_sql("e.embedding", "c.ce")
    dot_qc = _coldot_sql("q.qe", "c.ce")
    dot_eq = _coldot_sql("e.embedding", "p.qe")
    ne = _coldot_sql("e.embedding", "e.embedding")
    nq = _coldot_sql("p.qe", "p.qe")
    cos = (
        f"CASE WHEN sqrt({ne}) > 0 AND sqrt({nq}) > 0 "
        f"THEN ({dot_eq}) / (sqrt({ne}) * sqrt({nq})) END"
    )
    return f"""
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS ce
  FROM embeddings ORDER BY vec_id LIMIT {n_c}
),
centn AS (SELECT c.cell, c.ce, {inv} AS inv FROM cent c),
assign AS (
  SELECT e.vec_id, e.embedding, e.label, c.cell,
         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ({dot_ec}) * c.inv DESC, c.cell ASC) AS rn
  FROM embeddings e CROSS JOIN centn c
),
corpus AS (SELECT vec_id, embedding, label, cell FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, label AS ql, embedding AS qe
      FROM embeddings WHERE vec_id < 4),
qp AS (
  SELECT query_id, ql, qe, cell FROM (
    SELECT q.query_id, q.ql, q.qe, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY ({dot_qc}) * c.inv DESC, c.cell ASC) AS rn
    FROM q CROSS JOIN centn c
  ) WHERE rn <= {n_p}
),
cand AS (
  SELECT p.query_id, p.ql AS anchor_label,
         CASE WHEN e.label = p.ql THEN 'positive'
              ELSE 'negative' END AS pair_type,
         e.vec_id AS nn_id, e.label AS pair_label, {cos} AS cosine
  FROM qp p JOIN corpus e ON p.cell = e.cell
  WHERE e.label IS NOT NULL AND e.vec_id <> p.query_id
)
SELECT query_id, anchor_label, pair_type, nn_id, pair_label, cosine FROM (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY query_id, pair_type
                            ORDER BY cosine DESC NULLS LAST, nn_id) AS rn
  FROM cand
) WHERE rn <= 3
"""


__all__ = [
    "_COSINE_QE",
    "_COSINE_TOPK_FAST_ORACLE",
    "_COSINE_TOPK_ORACLE",
    "_DIM",
    "_DOT_QE",
    "_Q_SUB",
    "_SQ8_TOPK_ORACLE",
    "_SQ_EMB",
    "_SQ_QE",
    "_SYNTHETIC_OHLCV_ORACLE",
    "_ann_topk_oracle",
    "_coldot_sql",
    "_embedding_neardup_oracle",
    "_ivf_topk_oracle",
    "_kmeans_step_oracle",
    "_knn_join_oracle",
    "_plane_dot_sql",
    "_query_vector",
    "q_ann_topk",
    "q_cosine_topk",
    "q_cosine_topk_fast",
    "q_embedding_neardup_pairs",
    "q_ivf_topk",
    "q_ivfpq_topk",
    "_ivfpq_topk_oracle",
    "q_ivfpq_topk_indexed",
    "q_ivfpq_merge_topk",
    "q_ann_recall_panel",
    "_ann_recall_panel_oracle",
    "q_ann_recall_sweep",
    "_ann_recall_sweep_oracle",
    "q_ivf_topk_indexed",
    "q_kmeans_step",
    "q_kmeans_train",
    "_kmeans_train_oracle",
    "q_knn_join",
    "q_hard_negatives",
    "q_contrastive_pairs",
    "q_stream_contrastive_pairs",
    "_contrastive_pairs_oracle",
    "_hard_negatives_oracle",
    "q_sq8_topk",
    "q_bq_topk",
    "q_bq_topk_indexed",
    "q_stream_bq_topk",
    "_bq_topk_oracle",
    "q_pq_topk",
    "_pq_topk_oracle",
    "q_semantic_dedup",
    "_semantic_dedup_oracle",
    "q_semantic_dedup_incremental",
    "_semantic_dedup_incremental_oracle",
    "q_synthetic_ohlcv",
]
