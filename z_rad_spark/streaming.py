"""Structured Streaming surface: the engine's batch semantics on
unbounded transcript streams.

The reference is pure batch; the streaming mapping (SURVEY.md §2.13) is:

=======================  ====================================================
batch concept            streaming equivalent
=======================  ====================================================
as-of cutoff             watermark (no feature reads a turn past it)
gap sessionization       ``applyInPandasWithState`` custom stateful operator
per-cutoff feature rows  watermarked event-time window aggregates (append)
resume from checkpoint   streaming checkpointLocation (exactly-once state)
=======================  ====================================================

Scale notes: both operators shuffle once on ``conv_id`` (the engine's
canonical key); state per conversation is O(1) (the open session's
running aggregates), so 10^8 live conversations hold ~GBs of state in
the store, independent of turn volume. Late turns within the watermark
delay are handled exactly; turns older than the watermark are dropped by
the engine (the documented contract — same as a batch job pinned at an
as-of cutoff).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("session_end_us", T.LongType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("signal_sum", T.DoubleType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("signal_sum", T.DoubleType(), True),
    ]
)


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: float = 1800.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregates over a transcript stream.

    Emits one row per CLOSED session (a gap > ``gap_seconds`` observed,
    or the event-time timeout fired once the watermark passed the open
    session's last turn + gap). The open session per conversation lives
    in the state store and survives restarts via the checkpoint — the
    streaming twin of ``operators/sessionize.with_sessions``.
    """
    gap_us = int(gap_seconds * 1_000_000)

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, sig = state.get
            state.remove()
            yield pd.DataFrame(
                [[conv_id, start_us, last_us, n, sig]], columns=SESSION_SCHEMA.names
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        sig = rows["signal"].astype(float).to_numpy()
        order = ts_us.argsort(kind="stable")
        ts_us, sig = ts_us[order], sig[order]

        if state.exists:
            start_us, last_us, n, ssum = state.get
        else:
            start_us = last_us = -1
            n, ssum = 0, 0.0

        closed = []
        for t, s in zip(ts_us, sig):
            if start_us < 0:
                start_us, last_us, n, ssum = int(t), int(t), 1, float(s)
            elif int(t) - last_us > gap_us:
                closed.append([conv_id, start_us, last_us, n, ssum])
                start_us, last_us, n, ssum = int(t), int(t), 1, float(s)
            else:
                last_us, n, ssum = int(t), n + 1, ssum + float(s)
        state.update((start_us, last_us, n, ssum))
        # close the open session once the watermark passes its gap window
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(closed, columns=SESSION_SCHEMA.names)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_window_stats(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    signal_col: str = "signal",
) -> DataFrame:
    """Watermarked tumbling-window first-order aggregates per conversation
    (append mode: a window row is emitted exactly once, when the
    watermark passes its end — the streaming as-of contract). Pure
    built-in aggregates: partial aggregation + state store, no Python."""
    x = F.col(signal_col)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", window).alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(x).alias("signal_sum"),
            F.min(x).alias("signal_min"),
            F.max(x).alias("signal_max"),
        )
        .select(
            "conv_id",
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            F.unix_micros(F.col("w.end")).alias("window_end_us"),
            "n_turns",
            "signal_sum",
            "signal_min",
            "signal_max",
        )
    )
