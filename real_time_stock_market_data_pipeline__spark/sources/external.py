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


def fetch_ohlcv_history(symbols: list[str], period: str = "1y"):
    """S5: per-symbol daily OHLCV via yfinance (pandas frames, renamed
    to the engine schema like `batch_data_producer.py:76-83`). Not
    available in this container — raises with guidance."""
    try:
        import yfinance  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "yfinance is not installed in this environment; use "
            "synthetic_ohlcv() for deterministic fixtures or run this "
            "ingestion step where yfinance is available"
        ) from e
    frames = []
    for sym in symbols:  # pragma: no cover - needs network
        import yfinance as yf

        h = yf.Ticker(sym).history(period=period).reset_index()
        h = h.rename(
            columns={
                "Date": "date",
                "Open": "open",
                "High": "high",
                "Low": "low",
                "Close": "close",
                "Volume": "volume",
            }
        )
        h["symbol"] = sym
        frames.append(h[OHLCV_COLUMNS])
    return frames


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
    Python loops, no driver-side data."""
    symbols = symbols or ["AAPL", "MSFT", "GOOG", "AMZN", "TSLA"]
    sym_arr = F.array(*[F.lit(s) for s in symbols])
    n = days * len(symbols)
    df = spark.range(n).select(
        F.element_at(sym_arr, (F.col("id") % len(symbols) + 1).cast("int")).alias(
            "symbol"
        ),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") / len(symbols)).cast("int")).alias("date"),
        F.col("id"),
    )
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))  # noqa: E731
    o = F.lit(base_price) + (h("o") % 10000) / F.lit(100.0)
    spread = (h("s") % 500) / F.lit(100.0)
    c = o + (h("c") % 1000) / F.lit(100.0) - F.lit(5.0)
    return df.select(
        "symbol",
        "date",
        F.round(o, 2).alias("open"),
        F.round(F.greatest(o, c) + spread, 2).alias("high"),
        F.round(F.least(o, c) - spread, 2).alias("low"),
        F.round(c, 2).alias("close"),
        (h("v") % 1_000_000 + 1000).alias("volume"),
    )
