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


CUSUM_OUTPUT = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("date", StringType(), False),
        StructField("close", DoubleType(), True),
        StructField("ret", DoubleType(), True),
        StructField("s_pos", DoubleType(), True),
        StructField("s_neg", DoubleType(), True),
        StructField("alarm", LongType(), True),
    ]
)

CUSUM_STATE = StructType(
    [
        StructField("last_date", StringType(), True),
        StructField("prev_close", DoubleType(), True),
        StructField("s_pos", DoubleType(), True),
        StructField("s_neg", DoubleType(), True),
    ]
)


def stream_cusum_daily(
    source: DataFrame,
    kappa: float = 0.25,
    h: float = 2.0,
    symbol_col: str = "symbol",
    ts_col: str = "ts",
    price_col: str = "price",
    id_col: str = "id",
) -> DataFrame:
    """Streaming CUSUM change-point detector over per-symbol daily
    returns (Page 1954): two one-sided cumulative sums with slack
    ``kappa`` fire an alarm when either exceeds ``h``, then reset —
    the online drift monitor a tick pipeline runs on every series.

    Update per finalized day, in the literal order the oracle replays:

        r      = close / prev_close − 1
        s_pos  = max(0, s_pos + r − kappa)
        s_neg  = max(0, s_neg − r − kappa)
        alarm  = +1 if s_pos > h else −1 if s_neg > h else 0
        on alarm, both sums reset to 0 for the next day

    State is four scalars per key — O(keys), never O(history). Days
    at or before the last finalized day are dropped (same monotone
    trade-off as :func:`stream_ema_daily`); each symbol's first day
    only seeds ``prev_close`` and emits nothing. Raw doubles are
    emitted; the caller's batch projection applies display rounding.
    """

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_date, prev_close, s_pos, s_neg = state.get
        else:
            last_date, prev_close, s_pos, s_neg = "", None, 0.0, 0.0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, id_col]).reset_index(drop=True)
        rows["_day"] = rows[ts_col].dt.strftime("%Y-%m-%d")
        closes = rows.groupby("_day", sort=True)[price_col].last()
        out: dict[str, list] = {
            "date": [], "close": [], "ret": [],
            "s_pos": [], "s_neg": [], "alarm": [],
        }
        for day, close in closes.items():
            if day <= last_date:
                continue
            close = float(close)
            last_date = day
            if prev_close is None:
                prev_close = close
                continue
            r = close / prev_close - 1
            prev_close = close
            s_pos = max(0.0, s_pos + r - kappa)
            s_neg = max(0.0, s_neg - r - kappa)
            alarm = 1 if s_pos > h else (-1 if s_neg > h else 0)
            out["date"].append(day)
            out["close"].append(close)
            out["ret"].append(r)
            out["s_pos"].append(s_pos)
            out["s_neg"].append(s_neg)
            out["alarm"].append(alarm)
            if alarm:
                s_pos, s_neg = 0.0, 0.0
        state.update((last_date, prev_close, s_pos, s_neg))
        yield pd.DataFrame({"symbol": [key[0]] * len(out["date"]), **out})

    return source.groupBy(symbol_col).applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BLOOM_DEDUP_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("ts", StringType(), False),
        StructField("event_id", LongType(), False),
        StructField("fp", StringType(), False),
    ]
)

BLOOM_DEDUP_STATE = StructType(
    [
        StructField("word", LongType(), True),
        StructField("last_ts", StringType(), True),
        StructField("last_id", LongType(), True),
    ]
)

_SBF_BITS = 48  # stay clear of the int64 sign bit on every engine
_SBF_HASHES = 2


def _sbf_positions(fp: str) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"sbf{i}:{fp}".encode()).hexdigest()[:8], 16)
        % _SBF_BITS
        for i in range(_SBF_HASHES)
    ]


def stream_bloom_dedup(
    source: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Approximate streaming dedup with BOUNDED state: per key, a
    single 48-bit Bloom word over the fingerprint column — a row is
    emitted only if at least one of its 2 hash bits is unseen, then
    its bits are set. The O(1)-state alternative to
    ``dropDuplicates`` (whose state grows with distinct keys seen and
    needs watermark eviction): at 100 TB of events per key-space this
    holds ONE long per key forever, trading a deterministic,
    replayable false-positive drop rate (~(1−e^(−2n/48))² after n
    distinct fingerprints) for unbounded retention.

    Determinism: the md5 bit positions are engine-portable
    (`sbf{i}:` + fingerprint, same discipline as
    ``sketches.bloom_build``), rows fold in (ts, id) order, and
    late/replayed rows at or before the per-key high-water mark are
    dropped — so an ``availableNow`` drain is exactly replayed by the
    DuckDB recursive-CTE oracle walking the same order.

    Emit in append mode; the fingerprint should be computed with
    Spark expressions upstream so this handler only hashes strings.
    """

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            word, last_ts, last_id = state.get
            word = int(word)
        else:
            word, last_ts, last_id = 0, "", -1
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["_ts_str"] = rows[ts_col].dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        rows = rows.sort_values(["_ts_str", id_col]).reset_index(drop=True)
        out = {k: [] for k in BLOOM_DEDUP_OUTPUT.names}
        # plain-list zip, not iterrows (round 17, guide §4.2): the
        # per-row Series construction of iterrows dominated the
        # stateful pass; the fold itself is unchanged row for row
        kid = int(key[0])
        for ts_s, rid, fp in zip(
            rows["_ts_str"].tolist(),
            (int(x) for x in rows[id_col].tolist()),
            (str(x) for x in rows[fp_col].tolist()),
        ):
            if (ts_s, rid) <= (last_ts, last_id):
                continue
            last_ts, last_id = ts_s, rid
            bits = 0
            for p in _sbf_positions(fp):
                bits |= 1 << p
            if word & bits != bits:  # at least one unseen bit -> keep
                out["user_id"].append(kid)
                out["ts"].append(ts_s)
                out["event_id"].append(rid)
                out["fp"].append(fp)
            word |= bits
        state.update((word, last_ts, last_id))
        yield pd.DataFrame(out)

    return source.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=BLOOM_DEDUP_OUTPUT,
        stateStructType=BLOOM_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
