"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference stock-market lambda pipeline
(`thakare2912/Real_Time_Stock_Market_Data_Pipeline-`), re-designed
Spark-first.

The reference expresses its semantics as five copy-pasted scripts around
two PySpark jobs (see SURVEY.md). This package re-expresses the same
operator surface — and the north-star LLM-data-pipeline extensions —
as a reusable DataFrame/Structured-Streaming library:

- ``session``    : SparkSession factory (AQE on, UTC, Arrow on)
- ``schemas``    : single source-of-truth schema registry (fixes the
                   reference's percent_change/change_percent drift,
                   SURVEY.md §1.3)
- ``sources``    : batch/stream readers over parquet/CSV/Kafka/rate
- ``functions``  : scalar/cleaning/money/text/vector column expressions
- ``operators``  : bars, rolling windows, top-k, joins (incl. as-of),
                   dedup family (exact/keep-last/MinHash-LSH/SimHash/
                   n-gram-Jaccard/embedding), similarity search,
                   merge-upsert, set ops, pivot
- ``streaming``  : watermarked dual-window metrics + foreachBatch sinks
- ``plans``      : plan-inspection helpers (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
