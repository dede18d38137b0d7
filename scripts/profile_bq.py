#!/usr/bin/env python
"""Phase-level timing of the BQ family at sf0.1: split bq_topk /
bq_topk_indexed / rrf_hybrid_topk into driver-side build (py4j +
analysis), eager sub-actions (means fetch, candidate collect, index
writes) and execution (noop write). Throwaway measurement harness
(guide §1)."""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from real_time_stock_market_data_pipeline__spark.driver_queries._shared import (  # noqa: E501
        ensure_engine_conf,
    )
    from real_time_stock_market_data_pipeline__spark.driver_queries.similarity import (  # noqa: E501
        _query_vector,
    )
    from real_time_stock_market_data_pipeline__spark.operators import (
        similarity, text,
    )
    from real_time_stock_market_data_pipeline__spark.session import get_spark
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )

    spark = get_spark("rtsmdp-profile-bq")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_engine_conf(spark)
    embs = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    q = _query_vector(spark, SF_DIR)
    # warmup
    embs.write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}

    def clock(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return r

    # ---- bq_topk on the fly
    mu = clock("bq.means", lambda: similarity.bq_dim_means(embs))
    df = clock(
        "bq.build_plan",
        lambda: similarity.bq_topk(embs, q, k=10, refine=4, means=mu),
    )
    clock(
        "bq.exec",
        lambda: df.write.format("noop").mode("overwrite").save(),
    )
    # full operator incl. means (what the registered query pays)
    df2 = clock(
        "bq.full_build", lambda: similarity.bq_topk(embs, q, k=10, refine=4)
    )
    clock(
        "bq.full_exec",
        lambda: df2.write.format("noop").mode("overwrite").save(),
    )

    # ---- bq indexed
    tmp = tempfile.mkdtemp(prefix="bq_prof_")
    clock(
        "bqidx.write_index",
        lambda: similarity.bq_write_index(embs, f"{tmp}/bq"),
    )
    df3 = clock(
        "bqidx.probe_build",
        lambda: similarity.bq_topk_indexed(
            spark, embs, f"{tmp}/bq", q, k=10, refine=4
        ),
    )
    clock(
        "bqidx.probe_exec",
        lambda: df3.write.format("noop").mode("overwrite").save(),
    )

    # ---- rrf legs
    from real_time_stock_market_data_pipeline__spark.driver_queries.text import (  # noqa: E501
        _BM25_TERMS,
    )

    clock(
        "rrf.bm25_write_index",
        lambda: text.bm25_write_index(docs, f"{tmp}/bm25"),
    )
    df4 = clock(
        "rrf.fuse_build",
        lambda: text.rrf_hybrid_topk(
            spark, embs, f"{tmp}/bm25", f"{tmp}/bq",
            list(_BM25_TERMS), q, k=10, leg_k=30,
        ),
    )
    clock(
        "rrf.fuse_exec",
        lambda: df4.write.format("noop").mode("overwrite").save(),
    )

    print("PHASES", t, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
