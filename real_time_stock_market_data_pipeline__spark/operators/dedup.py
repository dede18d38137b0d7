"""Deduplication family — reference ops A4/A5 plus the north-star
LLM-data-pipeline dedup extensions (SURVEY.md §2.10).

Reference counterparts:
- A4 exact dedup: `dropDuplicates(["symbol","date"])`
  `/root/reference/src/spark/jobs/spark_batch_processor.py:83`
- A5 keep-last: pandas `drop_duplicates(..., keep='last')`
  `/root/reference/src/snowflake/load_to_snowflake.py:162` — Spark has
  no ordered keep-last, so it becomes the row_number pattern.

Design rules for 100 TB:
- exact dedup groups on a 256-bit content hash, never the raw text —
  the shuffle moves 32 bytes + keys per row instead of documents;
- nothing all-pairs: near-dup candidates come from MinHash-LSH band
  buckets (explode → groupBy band → within-bucket pairs), so cost is
  proportional to true collision volume, not n²;
- all hashes are engine-portable (md5/sha2 of explicit strings), so a
  SQL oracle can replay them; no JVM-internal hash functions leak into
  results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: MinHash configuration: 16 permutations → 8 bands × 2 rows.
#: Band collisions at Jaccard s have probability 1-(1-s^2)^8 — ~0.9 for
#: s=0.7, ~0.03 for s=0.2 — a reasonable near-dup operating point.
MINHASH_PERMS = 16
MINHASH_BAND_ROWS = 2


def normalized_text(col: str = "text") -> F.Column:
    """Canonical dedup key: lowercase, trimmed, whitespace-collapsed."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup groups: sha2-256 of normalized text → keeper id
    (deterministic min) + duplicate count.

    Equivalent coverage to A4's `dropDuplicates`, but deterministic
    (dropDuplicates keeps an arbitrary row) and shuffle-light (hash is
    computed map-side; only the 64-hex key and id shuffle).
    """
    return (
        docs.select(
            F.sha2(normalized_text(text_col), 256).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def dedup_keep_last(
    df: DataFrame, keys: list[str], order_by: list[str]
) -> DataFrame:
    """A5: keep the last row per key under an explicit total order —
    `row_number() over (partition by keys order by order_by desc) = 1`.

    The pandas original (`load_to_snowflake.py:162`) relies on file
    arrival order; here the order is declared, so the result is stable
    under any partitioning/AQE re-plan.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(text_col: str = "text", k: int = 3) -> F.Column:
    """Distinct k-word shingles of the normalized text (array<string>).

    Built with SQL higher-order functions — stays in codegen, and is
    replayable in the DuckDB oracle with list lambdas.
    """
    toks = F.split(normalized_text(text_col), " ")
    n = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    joined = F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]),
    )
    return F.array_distinct(joined)


def minhash_signature(shingle_col: F.Column, perms: int = MINHASH_PERMS) -> F.Column:
    """Portable MinHash: permutation *i* = lexicographic min of
    ``md5(i || ':' || shingle)``. md5-as-hex min is engine-portable
    (same strings in any SQL engine), unlike xxhash/murmur seeds.

    Returns array<string> of length ``perms`` (NULL entries if the
    document has no shingles).
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingle_col, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s))
                )
            )
            for i in range(perms)
        ]
    )


def minhash_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    perms: int = MINHASH_PERMS,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """(id, band_idx, band_hash) — one row per document per band."""
    sig = minhash_signature(shingles(text_col), perms)
    n_bands = perms // band_rows
    banded = docs.select(F.col(id_col), sig.alias("sig"))
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.element_at(F.col("sig"), b * band_rows + r + 1)
                            for r in range(band_rows)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return banded.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")


def dedup_minhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    perms: int = MINHASH_PERMS,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via LSH banding.

    Join is bucketed by (band_idx, band_hash): the only pairs
    materialized are actual band collisions — never an all-pairs
    cartesian (asserted in tests via the physical plan).
    """
    bands = minhash_bands(docs, id_col, text_col, perms, band_rows)
    a = bands.withColumnsRenamed({id_col: "id_a"})
    b = bands.withColumnsRenamed({id_col: "id_b"})
    pairs = a.join(b, ["band_idx", "band_hash"]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact k-gram Jaccard over LSH candidate pairs only.

    Verification step after `dedup_minhash_pairs`: recompute true
    Jaccard on the candidates (set intersection over union of distinct
    shingles) and keep pairs above threshold. Cost is
    O(candidates × shingles), independent of corpus size.
    """
    cand = dedup_minhash_pairs(docs, id_col, text_col)
    sh = docs.select(
        F.col(id_col), shingles(text_col, k).alias("sh")
    )
    j = (
        cand.join(sh.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        )
        .withColumn("uni", F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))))
        .withColumn(
            "jaccard",
            F.round(
                F.when(F.col("uni") > 0, F.col("inter") / F.col("uni")).otherwise(
                    F.lit(0.0)
                ),
                4,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash64(text_col: str = "text") -> F.Column:
    """64-bit SimHash of the token set, portable construction.

    Each distinct token hashes to 64 bits via the first 16 hex chars of
    md5; bit *j* of the fingerprint is 1 iff more tokens have bit *j*
    set than unset. Hamming-near fingerprints ≈ near-duplicate token
    distributions. Expressed with higher-order functions (no UDF).
    """
    toks = F.array_distinct(F.split(normalized_text(text_col), " "))
    tok_hash = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 16), 16, 10).cast("decimal(20,0)")
    )
    bits = []
    for j in range(64):
        weight = F.lit(2**j).cast("decimal(20,0)")
        votes = F.aggregate(
            tok_hash,
            F.lit(0),
            lambda acc, h, w=weight: acc
            + F.when(((h / w) % 2).cast("long") == 1, 1).otherwise(-1),
        )
        bits.append(F.when(votes > 0, F.lit(2**j).cast("decimal(20,0)")).otherwise(F.lit(0).cast("decimal(20,0)")))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("decimal(20,0)")
