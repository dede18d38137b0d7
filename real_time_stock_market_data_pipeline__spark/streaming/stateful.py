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
