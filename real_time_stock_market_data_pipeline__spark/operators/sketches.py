"""Distributed cardinality sketches.

``approx_count_distinct`` (HLL++) is Spark's native estimator, but its
sketch bytes are implementation-specific — no external engine can
replay them. The KMV (k-minimum-values) estimator here is chosen
because it is *deterministic and engine-portable*: hash each key with
md5, keep the k smallest hash values per group, and estimate
``(k−1) / u_k`` where ``u_k`` is the k-th smallest hash normalized to
[0,1) (Bar-Yossef et al. 2002). Same hashes → same estimate in any
engine, so the whole sketch is oracle-checkable bit-for-bit — and the
estimate's deviation from the exact count is itself a checked output.

Scale shape: one distinct-shuffle on (group, hash) — map-side partial
dedup — then one per-group sort feeding a single conditional aggregate
that produces the exact count AND the sketch in the same pass. (The
exact-count column is what keeps the full ranking alive; drop it and
an ``rn <= k`` filter plans as WindowGroupLimit with O(k) state. The
paired form is deliberate: the sketch's error is a checked output.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^60 — hashes are the first 15 hex chars of md5 (60 bits), so
#: ``h / 2^60`` is uniform in [0,1). Exactly representable as a double.
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate via the k-minimum-values
    sketch, alongside the exact count and the relative error.

    Returns one row per group: ``n_exact`` (exact distinct count of
    key *hashes* — md5 collisions merge identically in every engine),
    ``n_est`` (the KMV estimate; equals ``n_exact`` when the group has
    fewer than k keys), and ``rel_err``.
    """
    h = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    hashes = df.select(F.col(group_col).alias("grp"), h).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashes.select("grp", "h", F.row_number().over(w).alias("rn"))
    in_k = F.col("rn") <= k
    n_exact = F.count(F.lit(1))
    n_seen = F.max(F.when(in_k, F.col("rn")))
    kth = F.max(F.when(in_k, F.col("h")))
    u_k = kth.cast("double") / F.lit(_HASH_SPACE)
    est = F.when(n_seen < k, n_seen.cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )
    return ranked.groupBy("grp").agg(
        n_exact.alias("n_exact"),
        F.round(est, 4).alias("n_est"),
        F.round(F.abs(est - n_exact) / n_exact, 4).alias("rel_err"),
    )
