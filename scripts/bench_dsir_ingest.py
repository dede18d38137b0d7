"""Measured decade probe for the round-14 streaming DSIR service
(`streaming/pipeline.py:stream_dsir_ingest`): per-batch ingest cost
must track BATCH volume, not stored-state size — the buckets/docs
tables are id-hash-bucket partitioned MERGEs (touch ≤ 32 directories
per batch) and the stats table is one ≤ 256-row partial keyed on
batch_id, so nothing in the per-batch path is O(index).

For each corpus size N (default 250k / 1M / 4M docs — the r11
experiment-B decade), build the at-rest scoring state from N synthetic
docs, then drain a small fixed batch through the streaming sink twice
(round 1 from the cold seed, round 2 steady-state) and time each
drain. Prints one JSON line per N; results go to BASELINE.md.

Run: python scripts/bench_dsir_ingest.py [--rows 250000,1000000,4000000]
     [--batch-rows 1000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline__spark.operators import text
from real_time_stock_market_data_pipeline__spark.session import get_spark
from real_time_stock_market_data_pipeline__spark.streaming import pipeline


def synth_docs(spark, n_rows: int, id_offset: int = 0):
    """Deterministic 8-word documents: word ids from coprime moduli so
    the bigram-bucket distribution is non-degenerate."""
    df = spark.range(n_rows).select(
        (F.col("id") + id_offset).alias("doc_id")
    )
    words = [
        F.concat(F.lit(f"w{m}x"), (F.col("doc_id") % m).cast("string"))
        for m in (97, 193, 389, 769, 1543, 3079, 6151, 12289)
    ]
    return df.select(
        "doc_id",
        F.concat_ws(" ", *words).alias("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("en"))
        .otherwise(F.lit("de"))
        .alias("lang"),
    )


def run_cell(spark, n_rows: int, batch_rows: int) -> dict:
    tmp = Path(tempfile.mkdtemp(prefix=f"dsirab_{n_rows}_"))
    path = str(tmp / "index")
    text.dsir_write_index(synth_docs(spark, n_rows), path)
    in_dir = str(tmp / "in")
    ckpt = str(tmp / "ckpt")
    out = {"table": "dsir_index", "n_rows": n_rows, "batch_rows": batch_rows}
    for rnd in (1, 2):
        batch = synth_docs(
            spark, batch_rows, id_offset=n_rows + rnd * batch_rows
        )
        batch.coalesce(1).write.mode("append").parquet(in_dir)
        t0 = time.monotonic()
        src = pipeline.read_file_stream(spark, in_dir, schema=batch.schema)
        q = pipeline.stream_dsir_ingest(src, path, ckpt)
        q.awaitTermination()
        out[f"drain{rnd}_sec"] = round(time.monotonic() - t0, 3)
    n_bucket_rows = spark.read.parquet(path + "/buckets").count()
    out["stored_bucket_rows"] = n_bucket_rows
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="250000,1000000,4000000")
    ap.add_argument("--batch-rows", type=int, default=1000)
    args = ap.parse_args()
    spark = get_spark("dsir-ab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for n in [int(x) for x in args.rows.split(",")]:
        print(json.dumps(run_cell(spark, n, args.batch_rows)), flush=True)


if __name__ == "__main__":
    main()
