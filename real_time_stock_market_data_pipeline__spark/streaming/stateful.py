"""Custom stateful streaming operators via ``applyInPandasWithState``
— the escape hatch for semantics Spark's built-in windowed aggregates
can't express (SURVEY.md §2.7 notes the reference has none; a real
tick pipeline needs at least a running VWAP).

State is per-key and Arrow-batched: each micro-batch hands the handler
the key's new rows as pandas frames plus the persisted state tuple.
Scale: state size is O(keys), not O(events); the handler is an
incremental fold, so a key's history is never replayed."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

VWAP_OUTPUT = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("vwap", DoubleType(), True),
        StructField("total_volume", DoubleType(), True),
        StructField("n_events", LongType(), True),
    ]
)

VWAP_STATE = StructType(
    [
        StructField("pv", DoubleType(), True),
        StructField("vol", DoubleType(), True),
        StructField("n", LongType(), True),
    ]
)


def stream_running_vwap(
    source: DataFrame,
    symbol_col: str = "symbol",
    price_col: str = "price",
    volume_col: str = "volume",
) -> DataFrame:
    """Cumulative volume-weighted average price per symbol: one updated
    row per key per micro-batch. Emit in ``update`` output mode (memory
    sink / foreachBatch upsert)."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            pv, vol, n = state.get
        else:
            pv, vol, n = 0.0, 0.0, 0
        for pdf in pdfs:
            pv += float((pdf[price_col] * pdf[volume_col]).sum())
            vol += float(pdf[volume_col].sum())
            n += len(pdf)
        state.update((pv, vol, n))
        yield pd.DataFrame(
            {
                "symbol": [key[0]],
                "vwap": [pv / vol if vol else None],
                "total_volume": [vol],
                "n_events": [n],
            }
        )

    return source.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=VWAP_OUTPUT,
        stateStructType=VWAP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EMA_OUTPUT = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("date", StringType(), False),
        StructField("close", DoubleType(), True),
        StructField("ema", DoubleType(), True),
    ]
)

EMA_STATE = StructType(
    [
        StructField("last_date", StringType(), True),
        StructField("ema", DoubleType(), True),
    ]
)


def stream_ema_daily(
    source: DataFrame,
    span: int = 12,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str = "id",
) -> DataFrame:
    """Streaming twin of ``indicators.ema_macd``'s EMA recursion: a
    per-symbol exponential moving average over *daily closes*, folded
    incrementally as ticks arrive. State is two scalars per key
    (last finalized day, current EMA) — O(keys), never O(history).

    Within a batch, ticks are sorted by (ts, id) and collapsed to one
    close per calendar day; each new day advances the EMA with the
    literal ``α·x + (1−α)·ema`` update (α = 2/(span+1)), the same
    fixed-order arithmetic as the batch operator, so a single
    ``availableNow`` drain is bit-identical to the DuckDB
    recursive-CTE oracle. Days at or before the last finalized day
    (late arrivals in later micro-batches) are dropped — the
    documented trade-off of per-key monotone state; use the batch
    operator for out-of-order backfills.

    Raw doubles are emitted (close unrounded); display rounding is the
    caller's final Spark-side projection so engine rounding semantics
    stay in one place.
    """
    alpha = 2.0 / (span + 1)

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_date, ema = state.get
        else:
            last_date, ema = "", None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col]).reset_index(drop=True)
        rows["_day"] = rows[ts_col].dt.strftime("%Y-%m-%d")
        closes = rows.groupby("_day", sort=True)[price_col].last()
        out_days, out_close, out_ema = [], [], []
        for day, close in closes.items():
            if day <= last_date:
                continue
            close = float(close)
            ema = close if ema is None else alpha * close + (1 - alpha) * ema
            last_date = day
            out_days.append(day)
            out_close.append(close)
            out_ema.append(ema)
        state.update((last_date, ema))
        yield pd.DataFrame(
            {
                "symbol": [key[0]] * len(out_days),
                "date": out_days,
                "close": out_close,
                "ema": out_ema,
            }
        )

    return source.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=EMA_OUTPUT,
        stateStructType=EMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
