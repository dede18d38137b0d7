#!/usr/bin/env python
"""Phase-level timing of q_stream_curation_verdicts' components —
where do its ~12 bench seconds go at sf0.1? Mirrors the driver query
exactly (state init -> one-file stream drain -> indexed probe) with
wall timers around each phase, plus a manual re-run of the batch
body's sub-steps against a fresh state dir to split the drain into
its per-lane costs. Throwaway measurement harness (guide §1)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline__spark.driver_queries._shared import (  # noqa: E501
        ensure_engine_conf,
    )
    from real_time_stock_market_data_pipeline__spark.operators import curation
    from real_time_stock_market_data_pipeline__spark.session import get_spark
    from real_time_stock_market_data_pipeline__spark.sources.registry import (
        load_table,
    )
    from real_time_stock_market_data_pipeline__spark.streaming import pipeline

    spark = get_spark("rtsmdp-profile-curation")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_engine_conf(spark)
    # warmup
    load_table(spark, SF_DIR, "documents").write.format("noop").mode(
        "overwrite"
    ).save()

    t: dict[str, float] = {}

    def phase(name):
        class _P:
            def __enter__(self):
                spark.sparkContext.setJobDescription(name)
                self.t0 = time.time()

            def __exit__(self, *a):
                t[name] = round(time.time() - self.t0, 3)
                spark.sparkContext.setJobDescription(None)

        return _P()

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    tmp = tempfile.mkdtemp(prefix="curation_prof_")
    path = f"{tmp}/state"

    with phase("1_write_state"):
        curation.curation_write_state(
            bench, path, min_score=0.8, min_words=30
        )
    with phase("2_write_input"):
        docs.coalesce(1).write.parquet(f"{tmp}/in")
    with phase("3_stream_drain"):
        src = pipeline.read_file_stream(spark, f"{tmp}/in")
        q = pipeline.stream_curation_ingest(src, path, f"{tmp}/ckpt")
        q.awaitTermination()
    with phase("4_probe"):
        curation.curation_verdicts_indexed(spark, path).write.format(
            "noop"
        ).mode("overwrite").save()

    print("PHASES", t, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
