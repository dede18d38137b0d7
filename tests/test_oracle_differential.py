"""DuckDB-oracle differential tests (SURVEY.md §5 item 1) for a
representative slice of the registry; the full registry-wide sweep
(every entry in ``driver_queries.QUERIES``) runs in
scripts/check_correctness.py and in the round driver itself."""

from __future__ import annotations

import pytest

from real_time_stock_market_data_pipeline__spark import driver_queries
from real_time_stock_market_data_pipeline__spark.oracle_compare import compare

REPRESENTATIVE = [
    "daily_metrics",          # groupBy agg core
    "realtime_metrics",       # dual sliding windows + join
    "dedup_minhash_pairs",    # LSH banding
    "simhash",                # exploded bit votes
    "merge_upsert",           # J2/J3 upsert
    "asof_join",              # union-and-carry window
    "pricing_summary",        # decimal-exact aggregate chain
    "cosine_topk",            # left-fold float determinism
    "var_cvar",               # discrete rank-selected quantiles
    "cms_heavy_hitters",      # md5-bucket sketch replay
    "pca_pc1",                # iterative matvec, IEEE quantizer
    "late_suppliers",         # Q21 groupBy-reformulated semijoin
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_matches_oracle(name, spark, duck, sf_dir):
    sdf = driver_queries.QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(driver_queries.ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    problems = compare(sdf.columns, srows, ocols, orows)
    assert not problems, problems
    assert len(srows) > 0, f"{name} returned no rows"


def test_every_query_has_oracle_or_reason():
    # every registered query now has a DuckDB oracle — synthetic_ohlcv,
    # the last rows-only holdout, gained one when its generator moved
    # from xxhash64 to engine-portable md5/integer-cent arithmetic
    missing = set(driver_queries.QUERIES) - set(driver_queries.ORACLES)
    assert missing == set(), missing
