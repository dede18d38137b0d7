"""Deterministic sampling and dataset splitting.

``df.sample`` draws per-partition pseudo-random rows: the selection
changes with partitioning, repartition order, and AQE re-plans —
useless for reproducible train/val/test splits and impossible to
oracle-check. These operators instead derive the randomness from the
*row identity*: a 32-bit uniform hash of the id column (first 8 hex
chars of md5). The same row lands in the same split on any cluster, at
any parallelism, in any engine with md5 — which is how a 100 TB corpus
keeps its split stable while files are re-bucketed, and how the DuckDB
oracle replays the exact membership.

(No reference counterpart; SURVEY.md §2.10 scope — a training-data
pipeline primitive.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Bucket space for fractions: 1e6 buckets → fractions are exact to 1e-6.
HASH_BUCKETS = 1_000_000


def hash_bucket(col: F.Column, n_buckets: int = HASH_BUCKETS) -> F.Column:
    """Uniform deterministic bucket in [0, n_buckets) from the md5 of
    the stringified column. Map-side, codegen, engine-portable."""
    h32 = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return h32 % n_buckets


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, n_buckets: int = HASH_BUCKETS
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``id_col``.

    Membership is a pure function of the id: re-running, re-partitioning,
    or scaling the cluster returns the *same* rows (unlike
    ``df.sample``). Filter is map-side — no shuffle, no state."""
    return df.filter(hash_bucket(F.col(id_col), n_buckets) < int(fraction * n_buckets))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    n_buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic stratified sample: each stratum keeps its own
    fraction of rows (by id-hash range) — the corpus re-balancing step
    (downsample the over-represented crawl, keep all of the rare
    high-quality source) a training pipeline runs before mixing.

    Strata not named in ``fractions`` keep ``default_fraction``.
    Membership stays a pure function of (id, stratum fraction): stable
    under re-partitioning and replayable by any md5-capable engine.
    The filter is a map-side CASE over the hash bucket — no shuffle,
    no per-stratum pass; sampling 1000 strata costs the same one scan.
    """
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"stratified_hash_sample: fraction {frac} for {s!r}")
    b = hash_bucket(F.col(id_col), n_buckets)
    threshold = F.lit(int(default_fraction * n_buckets))
    for s, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == s, F.lit(int(frac * n_buckets))
        ).otherwise(threshold)
    return df.filter(b < threshold)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]] | None = None,
    n_buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Assign every row a split label by hash range — the reproducible
    train/val/test split. ``weights`` is an ordered (label, fraction)
    list summing to ≤ 1 (any remainder goes to the last label).

    Adds ``bucket`` and ``split`` columns; rows never move, so the
    split is a zero-shuffle projection and downstream writers can
    ``partitionBy('split')``."""
    weights = weights or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    b = hash_bucket(F.col(id_col), n_buckets)
    expr = F.lit(weights[-1][0])
    cum = 0.0
    thresholds = []
    for label, w in weights[:-1]:
        cum += w
        thresholds.append((label, int(cum * n_buckets)))
    for label, t in reversed(thresholds):
        expr = F.when(b < t, F.lit(label)).otherwise(expr)
    return df.withColumn("bucket", b).withColumn("split", expr)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    target_fraction: float,
    n_buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic importance-weighted sampling: each row keeps with
    probability ∝ its weight (capped at 1), scaled so the EXPECTED kept
    fraction is ``target_fraction`` — the quality-weighted downsampling
    step a training pipeline runs instead of uniform sampling (keep the
    good documents, thin the mediocre ones).

    Membership is a pure function of the row id and the global weight
    mean: ``keep ⇔ hash_bucket(id) < p_i·n_buckets`` with
    ``p_i = min(1, target·w_i / mean(w))``. The mean is a SCALAR
    SUBQUERY (via the SQL surface, like the registered Q22 shape):
    Spark plans it as one independent subquery stage broadcast by
    value — no join node at all. (A crossJoin+filter form folds into a
    BroadcastNestedLoopJoin, which the repo's blanket plan sweep
    forbids; a literal-key equi-join folds the same way because the
    constant key propagates.) The filter itself is map-side — no
    shuffle of the corpus, stable under re-partitioning, replayable by
    any md5-capable engine.

    Emits the kept rows' (id, weight, keep_prob). Note the cap: rows
    with ``w_i ≥ mean/target`` are always kept, so the realized
    fraction can undershoot ``target`` on heavy-tailed weights.
    """
    view = "__weighted_sample_base"
    df.select(
        F.col(id_col), F.round(F.col(weight_col).cast("double"), 6).alias("w")
    ).createOrReplaceTempView(view)
    mean_sql = (
        f"(SELECT CAST(sum(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / count(*)"
        f" FROM {view})"
    )
    keep_sql = (
        f"round(least(1.0, {target_fraction!r} * w / {mean_sql}), 6)"
    )
    bucket_sql = (
        f"pmod(CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 8),"
        f" 16, 10) AS BIGINT), {n_buckets})"
    )
    # keep_prob computed ONCE in the inner projection (a WHERE can't
    # see a SELECT alias; repeating the expression would plan the
    # scalar subquery twice and re-scan the weight column)
    return df.sparkSession.sql(
        f"""
        SELECT {id_col}, w AS {weight_col}, keep_prob FROM (
          SELECT {id_col}, w, {keep_sql} AS keep_prob,
                 {bucket_sql} AS __bk
          FROM {view}
        )
        WHERE __bk < keep_prob * CAST({n_buckets} AS DOUBLE)
        """
    )


def zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
) -> DataFrame:
    """Z-order (Morton) interleaved key over two numeric columns — the
    lakehouse co-clustering trick: writing files sorted by this key
    keeps rows close in BOTH dimensions close on disk, so 2-D range
    predicates prune file-level min/max zones instead of scanning one
    dimension's worth of files.

    Each column maps to a ``bits``-bit rank bucket via its min/max
    range (window over the frame — one pass), then the bit-interleave
    is pure integer arithmetic (Σ bit_i · 4^i shifts), identical in
    any engine. Emits the input keys + bucket pair + zorder key;
    writers sort/range-partition by ``zkey``.
    """
    wall = Window.partitionBy()
    a, b = F.col(col_a).cast("double"), F.col(col_b).cast("double")
    amin, amax = F.min(a).over(wall), F.max(a).over(wall)
    bmin, bmax = F.min(b).over(wall), F.max(b).over(wall)
    n = float((1 << bits) - 1)

    def bucket(col, lo, hi):
        # rank-bucket in [0, 2^bits): floor of the normalized position
        # (max value clamps to the top bucket)
        return F.least(
            F.floor(
                F.when(hi > lo, (col - lo) / (hi - lo))
                .otherwise(F.lit(0.0))
                * F.lit(n + 1.0)
            ).cast("bigint"),
            F.lit(int(n)),
        )

    based = df.select(
        "*",
        bucket(a, amin, amax).alias("bucket_a"),
        bucket(b, bmin, bmax).alias("bucket_b"),
    )
    # interleave: zkey = Σ_i  bit_i(a)·2^(2i+1) + bit_i(b)·2^(2i)
    zkey = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftrightunsigned(F.col("bucket_a"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftrightunsigned(F.col("bucket_b"), i).bitwiseAND(F.lit(1))
        zkey = zkey + bit_a * F.lit(1 << (2 * i + 1)) + bit_b * F.lit(1 << (2 * i))
    return based.withColumn("zkey", zkey)


def balanced_downsample(
    df: DataFrame,
    label_col: str,
    id_col: str,
) -> DataFrame:
    """Deterministic class balancing: downsample every label to the
    MINORITY class size by keeping each label's lowest-hash-ranked
    rows — the id-hash makes membership a pure function of the data
    (same rows kept on any cluster, any partitioning), unlike
    ``sampleBy``'s seeded-RNG rows-by-position. The class-imbalance
    guard before training a classifier on skewed labels.

    Shape: one aggregation pass for the label counts (label-
    cardinality rows; the global minimum is a window over THAT tiny
    frame, never over the data), broadcast back by label, then one
    label-key shuffle for the deterministic rank window. Output drops
    nothing but rows: schema-stable.
    """
    counts = df.groupBy(F.col(label_col)).agg(
        F.count(F.lit(1)).alias("__n_label")
    )
    cap = counts.select(
        F.col(label_col),
        F.min("__n_label").over(Window.partitionBy()).alias("__cap"),
    )
    wr = Window.partitionBy(label_col).orderBy(
        hash_bucket(F.col(id_col)), F.col(id_col)
    )
    ranked = df.join(F.broadcast(cap), label_col).withColumn(
        "__rn", F.row_number().over(wr)
    )
    return ranked.where(F.col("__rn") <= F.col("__cap")).drop(
        "__rn", "__cap"
    )
