"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference stock-market lambda pipeline
(`thakare2912/Real_Time_Stock_Market_Data_Pipeline-`), re-designed
Spark-first.

The reference expresses its semantics as five copy-pasted scripts around
two PySpark jobs (see SURVEY.md). This package re-expresses the same
operator surface — and the north-star LLM-data-pipeline extensions —
as a reusable DataFrame/Structured-Streaming library:

- ``session``       : SparkSession factory (AQE on, UTC, Arrow on) +
                      parallelism guard for CPU-heavy small inputs
- ``schemas``       : single source-of-truth schema registry (fixes
                      the reference's percent_change/change_percent
                      drift, SURVEY.md §1.3)
- ``sources``       : batch readers (parquet/CSV, partition-pruned)
- ``functions``     : scalar/cleaning/derivation column expressions
- ``operators``     : OHLCV daily metrics + returns, dual sliding-window
                      realtime metrics, top-k (global + per-group),
                      quantile summaries, dedup family (exact /
                      keep-last / MinHash-LSH / n-gram-Jaccard /
                      SimHash), similarity search (exact + LSH ANN +
                      IVF-flat + pandas-UDF fast path), text analysis
                      (stats / tokens / terms / lang-ID / fingerprints),
                      merge-upsert, as-of join, range join, sessionize,
                      cascading rollup, salted skew agg/join, set ops,
                      pivot, rollup/cube, multimodal feature plumbing
- ``streaming``     : file/rate/Kafka sources, watermarked windows,
                      foreachBatch dual-window metrics + keyed upsert,
                      session windows, streaming dedup, stateful VWAP,
                      RocksDB state-store option
- ``sinks``         : partitioned parquet/CSV writers, bucketed tables,
                      Kafka producer, parquet merge-upsert,
                      availability gate
- ``plans``         : plan-inspection asserts (no-cartesian,
                      broadcast, pushdown)
- ``driver_queries``: every operator as an oracle-checked query
"""

__version__ = "0.1.0"
