"""Deduplication family: exact, keep-last, MinHash-LSH, SimHash, clustering, incremental index.

Split out of the original single-file driver_queries module; sections
are verbatim (code moved, not rewritten) so oracle parity is untouched.
"""

from __future__ import annotations

from real_time_stock_market_data_pipeline__spark.driver_queries._shared import *  # noqa: F401,F403


# --------------------------------------------------------------------------
# Dedup family
# --------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(_table("documents")(spark, sf_dir))


_DEDUP_EXACT_ORACLE = f"""
SELECT sha256({_NORM.format(col="text")}) AS text_hash,
       min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM documents GROUP BY 1
"""


def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_keep_last(
        _events(spark, sf_dir),
        keys=["user_id", "event_type"],
        order_by=["ts", "event_id"],
    )


_KEEP_LAST_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t
WHERE rn = 1
"""

#: k=3 word shingles of normalized text, DuckDB list lambdas
_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(toks) - 2, 0) + 1), "
    "i -> array_to_string(list_slice(toks, i, i + 2), ' ')))"
)

_TOKS = f"string_split({_NORM.format(col='text')}, ' ')"


def _minhash_cte() -> str:
    # 32-bit base hash: first 8 hex chars of md5, decoded with nibble
    # arithmetic (DuckDB has no hex→int conv)
    h32 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(s), {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    sig_entries = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {dedup.MINHASH_P}))"
        for a, b in zip(dedup.MINHASH_A, dedup.MINHASH_B)
    )
    return f"""
sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
),
nonempty AS (SELECT doc_id, sh FROM sh WHERE len(sh) > 0),
hs AS (SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hs FROM nonempty),
sig AS (SELECT doc_id, [{sig_entries}] AS sig FROM hs),
bands AS (
  SELECT doc_id, b.band_idx,
         md5(CAST(sig[b.band_idx * 2 + 1] AS VARCHAR) || '|' || CAST(sig[b.band_idx * 2 + 2] AS VARCHAR)) AS band_hash
  FROM sig CROSS JOIN (SELECT unnest(range({dedup.MINHASH_PERMS // dedup.MINHASH_BAND_ROWS})) AS band_idx) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM bands a JOIN bands b2 USING (band_idx, band_hash)
  WHERE a.doc_id < b2.doc_id
)"""


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_minhash_pairs(_table("documents")(spark, sf_dir))


_MINHASH_ORACLE = f"WITH {_minhash_cte()} SELECT id_a, id_b FROM cand"


def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screen: a perturbed new batch (every 5th
    doc, 'v2 '-prefixed, ids shifted by 10⁶) against the existing
    corpus — per (new, corpus) candidate with its band-collision
    strength (`operators/dedup.py:incremental_neardup`)."""
    docs = _table("documents")(spark, sf_dir)
    new_batch = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("v2 "), F.col("text")).alias("text"),
    )
    return dedup.incremental_neardup(new_batch, docs)


def _incremental_neardup_oracle() -> str:
    h32 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(s), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    sig_entries = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {dedup.MINHASH_P}))"
        for a, b in zip(dedup.MINHASH_A, dedup.MINHASH_B)
    )
    n_bands = dedup.MINHASH_PERMS // dedup.MINHASH_BAND_ROWS

    def bands_for(src: str, name: str) -> str:
        return f"""
{name}_sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM {src}) t
),
{name}_ne AS (SELECT doc_id, sh FROM {name}_sh WHERE len(sh) > 0),
{name}_hs AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hs FROM {name}_ne
),
{name}_sig AS (SELECT doc_id, [{sig_entries}] AS sig FROM {name}_hs),
{name}_bands AS (
  SELECT doc_id, b.band_idx,
         md5(CAST(sig[b.band_idx * 2 + 1] AS VARCHAR) || '|'
             || CAST(sig[b.band_idx * 2 + 2] AS VARCHAR)) AS band_hash
  FROM {name}_sig CROSS JOIN
       (SELECT unnest(range({n_bands})) AS band_idx) b
)"""

    return f"""
WITH newb AS (
  SELECT doc_id + 1000000 AS doc_id, 'v2 ' || text AS text
  FROM documents WHERE doc_id % 5 = 0
),
{bands_for('newb', 'n')},
{bands_for('documents', 'c')}
SELECT n_bands.doc_id AS new_id, c_bands.doc_id AS corpus_id,
       count(*) AS shared_bands
FROM n_bands JOIN c_bands USING (band_idx, band_hash)
GROUP BY 1, 2
"""


def q_incremental_neardup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same incremental screen through the AT-REST dedup index:
    corpus band signatures written to parquet once, the new batch
    joined against the stored table (`operators/dedup.py:
    write_dedup_index` / `incremental_neardup_indexed`). Same oracle
    as the live path — the identical-result contract of the index."""
    import tempfile

    docs = _table("documents")(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="dedup_idx_") + "/bands"
    dedup.write_dedup_index(docs, idx)
    new_batch = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("v2 "), F.col("text")).alias("text"),
    )
    return dedup.incremental_neardup_indexed(new_batch, idx)


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH pair graph via iterative
    min-label propagation (Pregel-style, localCheckpoint-truncated);
    oracle = recursive-CTE transitive closure of the same edges."""
    return dedup.neardup_clusters(_table("documents")(spark, sf_dir))


_NEARDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_minhash_cte()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM cand
  UNION
  SELECT id_b AS u, id_a AS v FROM cand
),
reach AS (
  SELECT u AS src, u AS dst FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u
),
comp AS (SELECT src, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id,
       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       coalesce(c.cluster_id, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.src
"""


def q_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-canonical dedup decision applied to the corpus: one
    document per near-dup cluster plus singletons, payload columns
    intact (text dropped here only to keep the driver hash light)."""
    return dedup.dedup_corpus(_table("documents")(spark, sf_dir)).select(
        "doc_id", "source", "lang", "n_chars"
    )


_DEDUP_CORPUS_ORACLE = f"""
WITH RECURSIVE {_minhash_cte()},
edges AS (
  SELECT id_a AS u, id_b AS v FROM cand
  UNION
  SELECT id_b AS u, id_a AS v FROM cand
),
reach AS (
  SELECT u AS src, u AS dst FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u
),
comp AS (SELECT src, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id, d.source, d.lang, d.n_chars
FROM documents d LEFT JOIN comp c ON d.doc_id = c.src
WHERE coalesce(c.cluster_id, d.doc_id) = d.doc_id
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _table("documents")(spark, sf_dir), threshold=0.5
    )


_JACCARD_ORACLE = f"""
WITH {_minhash_cte()},
scored AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(sa.sh, sb.sh)) AS inter,
         len(list_distinct(list_concat(sa.sh, sb.sh))) AS uni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
       round(CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 4) AS jaccard
FROM scored
WHERE round(CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 4) >= 0.5
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_table("documents")(spark, sf_dir))


def q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pair extraction via 4-block banding (exact recall for
    Hamming ≤ 3 by pigeonhole) — the engine joins 16-bit block buckets;
    the oracle can afford the plain all-pairs Hamming join because the
    two are provably the same set."""
    return dedup.simhash_neardup_pairs(_table("documents")(spark, sf_dir))


def _simhash_neardup_oracle() -> str:
    ham = " + ".join(
        "bit_count(xor(CAST(strpos('0123456789abcdef', substr(a.simhash, {i}, 1)) - 1 AS BIGINT),"
        " CAST(strpos('0123456789abcdef', substr(b.simhash, {i}, 1)) - 1 AS BIGINT)))".format(
            i=i + 1
        )
        for i in range(16)
    )
    return f"""
WITH s AS ({_simhash_oracle()})
SELECT id_a, id_b, hamming FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(({ham}) AS INTEGER) AS hamming
  FROM s a JOIN s b ON a.doc_id < b.doc_id
) WHERE hamming <= 3
"""


def _simhash_oracle() -> str:
    """Mirror of operators.dedup.simhash, generated with the same
    nibble/bit loops."""
    votes = ", ".join(
        "sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {p1}, 1)) - 1)"
        " // {w}) % 2 = 1 THEN 1 ELSE -1 END) AS v{p}_{b}".format(
            p1=p + 1, w=2 ** (3 - b), p=p, b=b
        )
        for p in range(16)
        for b in range(4)
    )
    out_nibbles = ", ".join(
        " + ".join(
            f"(CASE WHEN v{p}_{b} > 0 THEN {2 ** (3 - b)} ELSE 0 END)"
            for b in range(4)
        )
        + f" AS o{p}"
        for p in range(16)
    )
    chars = " || ".join(
        f"substr('0123456789abcdef', o{p} + 1, 1)" for p in range(16)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
),
nib AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
votes AS (SELECT doc_id, {votes} FROM nib GROUP BY doc_id),
outn AS (SELECT doc_id, {out_nibbles} FROM votes)
SELECT doc_id, {chars} AS simhash FROM outn
"""




def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup (`operators/dedup.py:substring_dedup`,
    Lee et al. 2022 ExactSubstr re-expressed at non-overlapping 8-word
    block granularity): for every distinct block value only the
    globally first occurrence (lowest (doc_id, pos)) survives; each
    doc reports its block/kept counts and the md5 of its reconstructed
    text. The oracle replays segmentation, the first-occurrence
    window, and the position-ordered rebuild in SQL."""
    return dedup.substring_dedup(_table("documents")(spark, sf_dir))


def _substring_dedup_oracle(n_words: int = 8) -> str:
    w = n_words
    return f"""
WITH wrd AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
),
blocks AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(words[(i*{w}+1):(i*{w}+{w})], ' ') AS block
  FROM wrd, UNNEST(range(CAST(ceil(len(words)/{w}.0) AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY block
                               ORDER BY doc_id, pos) AS rn
  FROM blocks
)
SELECT doc_id,
       COUNT(*) AS n_blocks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN block END,
                               ' ' ORDER BY pos), '')) AS dedup_text_md5
FROM ranked GROUP BY doc_id
"""


def q_substring_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-shaped exact substring dedup
    (`operators/dedup.py:substring_dedup_incremental`): the block
    index is built at rest from the id-prefix half of the corpus
    (`write_block_index`), then the other half screens against it —
    stored blocks outrank arriving ones, intra-batch repeats keep
    their first occurrence. Because ids(corpus) < ids(batch), the
    oracle is simply the FULL substring_dedup replay restricted to
    batch documents (the split constant is derived in SQL the same
    way the Spark side derives it)."""
    import tempfile

    docs = _table("documents")(spark, sf_dir)
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    corpus = docs.filter(F.col("doc_id") < n // 2)
    batch = docs.filter(F.col("doc_id") >= n // 2)
    path = tempfile.mkdtemp(prefix="blockidx_") + "/index"
    dedup.write_block_index(corpus, path)
    return dedup.substring_dedup_incremental(batch, path)


def _substring_dedup_incremental_oracle(n_words: int = 8) -> str:
    w = n_words
    return f"""
WITH wrd AS (
  SELECT doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
),
blocks AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(words[(i*{w}+1):(i*{w}+{w})], ' ') AS block
  FROM wrd, UNNEST(range(CAST(ceil(len(words)/{w}.0) AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY block
                               ORDER BY doc_id, pos) AS rn
  FROM blocks
),
split AS (SELECT (max(doc_id) + 1) // 2 AS s FROM documents)
SELECT doc_id,
       COUNT(*) AS n_blocks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN block END,
                               ' ' ORDER BY pos), '')) AS dedup_text_md5
FROM ranked, split
WHERE doc_id >= split.s
GROUP BY doc_id
"""


def _bands_for_sql(src: str, name: str) -> str:
    """Band CTE chain for an arbitrary (doc_id, text) relation —
    module-level twin of the fragment builder inside
    `_incremental_neardup_oracle` (kept verbatim there for oracle
    stability)."""
    h32 = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(s), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    sig_entries = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b})"
        f" % {dedup.MINHASH_P}))"
        for a, b in zip(dedup.MINHASH_A, dedup.MINHASH_B)
    )
    n_bands = dedup.MINHASH_PERMS // dedup.MINHASH_BAND_ROWS
    return f"""
{name}_sh AS (
  SELECT doc_id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM {src}) t
),
{name}_ne AS (SELECT doc_id, sh FROM {name}_sh WHERE len(sh) > 0),
{name}_hs AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hs FROM {name}_ne
),
{name}_sig AS (SELECT doc_id, [{sig_entries}] AS sig FROM {name}_hs),
{name}_bands AS (
  SELECT doc_id, b.band_idx,
         md5(CAST(sig[b.band_idx * 2 + 1] AS VARCHAR) || '|'
             || CAST(sig[b.band_idx * 2 + 2] AS VARCHAR)) AS band_hash
  FROM {name}_sig CROSS JOIN
       (SELECT unnest(range({n_bands})) AS band_idx) b
)"""


def _screen_batch(docs: DataFrame) -> DataFrame:
    """The deterministic new-crawl batch every screen query shares:
    two clone waves of every 4th document (ids +1e6 and +2e6 — the
    second wave collides with BOTH the corpus and the first wave) plus
    an all-unique wave (ids +3e6, every-word-id-stamped text — no
    collisions possible), so all three verdict columns are exercised."""
    base = docs.where(F.col("doc_id") % 4 == 0)
    c1 = base.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), F.col("text")
    )
    c2 = base.select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"), F.col("text")
    )
    i = F.col("doc_id").cast("string")
    uniq_text = F.concat(
        F.lit("uq"), i, F.lit("a uq"), i, F.lit("b uq"), i,
        F.lit("c uq"), i, F.lit("d"),
    )
    u = docs.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + F.lit(3_000_000)).alias("doc_id"),
        uniq_text.alias("text"),
    )
    return c1.unionByName(c2).unionByName(u)


_SCREEN_BATCH_SQL = """
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         'uq' || doc_id || 'a uq' || doc_id || 'b uq' || doc_id || 'c uq'
           || doc_id || 'd' AS text
  FROM documents WHERE doc_id % 9 = 0
"""


def q_neardup_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-ordered near-dup verdict of a new crawl batch against
    the corpus (`operators/dedup.py:neardup_screen`): per new doc, the
    count of distinct corpus colliders, distinct LOWER-ID in-batch
    colliders, and the dup verdict — the keep/drop decision a crawl
    ingest makes, with transitive clone chains collapsing to the
    first arrival."""
    docs = _table("documents")(spark, sf_dir)
    return dedup.neardup_screen(_screen_batch(docs), docs)


def _neardup_screen_oracle() -> str:
    return f"""
WITH newb AS ({_SCREEN_BATCH_SQL}),
{_bands_for_sql('newb', 'n')},
{_bands_for_sql('documents', 'c')},
ch AS (
  SELECT n_bands.doc_id, count(DISTINCT c_bands.doc_id) AS n_corpus_dups
  FROM n_bands JOIN c_bands USING (band_idx, band_hash) GROUP BY 1
),
ph AS (
  SELECT a.doc_id, count(DISTINCT p.doc_id) AS n_prior_dups
  FROM n_bands a JOIN n_bands p
    ON a.band_idx = p.band_idx AND a.band_hash = p.band_hash
   AND p.doc_id < a.doc_id
  GROUP BY 1
)
SELECT nb.doc_id,
       CAST(coalesce(ch.n_corpus_dups, 0) AS BIGINT) AS n_corpus_dups,
       CAST(coalesce(ph.n_prior_dups, 0) AS BIGINT) AS n_prior_dups,
       (coalesce(ch.n_corpus_dups, 0) + coalesce(ph.n_prior_dups, 0)) > 0
         AS dup
FROM newb nb
LEFT JOIN ch ON nb.doc_id = ch.doc_id
LEFT JOIN ph ON nb.doc_id = ph.doc_id
"""


__all__ = [
    "_DEDUP_CORPUS_ORACLE",
    "_DEDUP_EXACT_ORACLE",
    "_JACCARD_ORACLE",
    "_KEEP_LAST_ORACLE",
    "_MINHASH_ORACLE",
    "_NEARDUP_CLUSTERS_ORACLE",
    "_SHINGLES",
    "_TOKS",
    "_incremental_neardup_oracle",
    "_minhash_cte",
    "_simhash_neardup_oracle",
    "_simhash_oracle",
    "q_dedup_corpus",
    "q_dedup_exact",
    "q_dedup_keep_last",
    "q_dedup_minhash_pairs",
    "q_incremental_neardup",
    "q_incremental_neardup_indexed",
    "q_neardup_clusters",
    "q_neardup_screen",
    "_neardup_screen_oracle",
    "_bands_for_sql",
    "_screen_batch",
    "_SCREEN_BATCH_SQL",
    "q_ngram_jaccard_pairs",
    "q_simhash",
    "q_simhash_neardup_pairs",
    "q_substring_dedup",
    "_substring_dedup_oracle",
    "q_substring_dedup_incremental",
    "_substring_dedup_incremental_oracle",
]
