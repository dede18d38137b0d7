"""External / synthetic OHLCV ingestion — reference S5/S6
(`/root/reference/src/kafka/producer/batch_data_producer.py:65-98`,
`stream_data_producer.py:73-110`).

The yfinance fetch is an out-of-engine ingestion concern; it is gated
behind the import so environments without the library (this container)
fail loudly at the call site, not at import. For tests and benchmarks
``synthetic_ohlcv`` generates the same shape deterministically,
engine-side (distributed ``spark.range``, hash-derived columns — no
driver-side loops, seedable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OHLCV_COLUMNS = ["symbol", "date", "open", "high", "low", "close", "volume"]


def fetch_ohlcv_history(
    spark: SparkSession, symbols: list[str], period: str = "1y"
) -> DataFrame:
    """S5: per-symbol daily OHLCV via yfinance, normalized through the
    tested :func:`normalize_provider_ohlcv` chain (rename → date →
    symbol stamp → column order, `batch_data_producer.py:76-98`). Only
    the network fetch itself is broker-bound; everything after
    ``createDataFrame`` is the exercised engine path. Not available in
    this container — raises with guidance."""
    try:
        import yfinance as yf
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "yfinance is not installed in this environment; use "
            "synthetic_ohlcv() for deterministic fixtures or run this "
            "ingestion step where yfinance is available"
        ) from e
    out: DataFrame | None = None  # pragma: no cover - needs network
    for sym in symbols:  # pragma: no cover - needs network
        h = yf.Ticker(sym).history(period=period).reset_index()
        norm = normalize_provider_ohlcv(spark.createDataFrame(h), symbol=sym)
        out = norm if out is None else out.unionByName(norm)
    if out is None:  # pragma: no cover
        raise ValueError("fetch_ohlcv_history: empty symbol list")
    return out


def synthetic_ohlcv(
    spark: SparkSession,
    symbols: list[str] | None = None,
    days: int = 365,
    seed: int = 42,
    base_price: float = 100.0,
) -> DataFrame:
    """S6: deterministic synthetic daily OHLCV, generated distributed.

    One `spark.range(days * len(symbols))` with hash-derived pseudo-
    random columns — same seed ⇒ same table on any cluster layout; no
    Python loops, no driver-side data.

    The per-row entropy is the first 32 bits of
    ``md5("<id>:<seed>:<salt>")`` — engine-portable (DuckDB replays the
    identical bytes; see the ``synthetic_ohlcv`` oracle), unlike the
    earlier xxhash64 form which was Spark-only. All prices are built in
    integer cents and divided by 100.0 at the end, so no float rounding
    mode can diverge between engines (matching the MINHASH-constant
    portability pattern in ``operators/dedup.py``)."""
    symbols = symbols or ["AAPL", "MSFT", "GOOG", "AMZN", "TSLA"]
    sym_arr = F.array(*[F.lit(s) for s in symbols])
    n = days * len(symbols)
    df = spark.range(n).select(
        F.element_at(sym_arr, (F.col("id") % len(symbols) + 1).cast("int")).alias(
            "symbol"
        ),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            F.floor(F.col("id") / len(symbols)).cast("int"),
        ).alias("date"),
        F.col("id"),
    )

    def h(salt: str) -> F.Column:
        key = F.concat_ws(
            ":", F.col("id").cast("string"), F.lit(str(seed)), F.lit(salt)
        )
        return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")

    base_cents = int(round(base_price * 100))
    o_c = F.lit(base_cents) + h("o") % 10000
    spread_c = h("s") % 500
    c_c = o_c + h("c") % 1000 - F.lit(500)
    cents = F.lit(100.0)
    return df.select(
        "symbol",
        "date",
        (o_c / cents).alias("open"),
        ((F.greatest(o_c, c_c) + spread_c) / cents).alias("high"),
        ((F.least(o_c, c_c) - spread_c) / cents).alias("low"),
        (c_c / cents).alias("close"),
        (h("v") % 1_000_000 + 1000).alias("volume"),
    )


#: Provider → engine column names, the reference fetcher's rename map
#: (`batch_data_producer.py:76-83`). Extra provider columns
#: (Dividends, Stock Splits, Adj Close...) are dropped by the select.
PROVIDER_RENAME = {
    "Date": "date",
    "Open": "open",
    "High": "high",
    "Low": "low",
    "Close": "close",
    "Volume": "volume",
}


def normalize_provider_ohlcv(
    df: DataFrame,
    symbol: str | None = None,
    batch_id: str | None = None,
    batch_date: str | None = None,
) -> DataFrame:
    """Normalize a provider-shaped OHLCV frame (yfinance's
    ``Date/Open/High/Low/Close/Volume`` capitalization, possibly with
    extra columns) to the engine schema — the exercised equivalent of
    the reference fetcher's rename → date-format → symbol-stamp →
    column-order → batch-stamp chain (`batch_data_producer.py:76-98`).

    Differences by design: the date lands as a DATE column (the
    reference's ``strftime("%Y-%m-%d")`` string is a Kafka-JSON
    serialization detail, applied by ``sinks.encode_keyed_json`` at
    the wire); the batch stamps are caller-supplied values, not
    ``now()``, so runs are reproducible and idempotently re-ingestable.

    Works on a Spark DataFrame (e.g. ``spark.createDataFrame`` of the
    provider's pandas output, or any re-ingested raw dump). Purely
    narrow (rename/cast/literal) — no shuffle at any scale.
    """
    out = df
    for src, dst in PROVIDER_RENAME.items():
        if src in out.columns:
            out = out.withColumnRenamed(src, dst)
    missing = [c for c in ("date", "open", "high", "low", "close", "volume")
               if c not in out.columns]
    if missing:
        raise ValueError(
            f"normalize_provider_ohlcv: input lacks {missing} after rename "
            f"(columns: {df.columns})"
        )
    out = out.withColumn("date", F.col("date").cast("date"))
    if symbol is not None and "symbol" not in out.columns:
        out = out.withColumn("symbol", F.lit(symbol))
    cols = list(OHLCV_COLUMNS)
    if batch_id is not None:
        out = out.withColumn("batch_id", F.lit(batch_id))
        cols.append("batch_id")
    if batch_date is not None:
        out = out.withColumn(
            "batch_date", F.lit(batch_date).cast("date")
        )
        cols.append("batch_date")
    return out.select(*cols)
