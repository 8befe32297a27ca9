"""Gap-based sessionization and windowed lag/lead derived columns.

The temporal analogue of Z-Rad's slice decomposition
(zrad/radiomics/glcm.py:154-166): a session is a maximal sub-sequence of
a conversation whose inter-turn gaps stay within ``gap_seconds``.

Pure window expressions — one hash exchange on conv_id (reused by every
downstream per-conversation operator), whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ORDER = ("ts", "turn_idx")


def _conv_window() -> Window:
    return Window.partitionBy("conv_id").orderBy(*_ORDER)


def with_sessions(df: DataFrame, gap_seconds: float) -> DataFrame:
    """Add ``session_id`` (0-based per conversation) and ``gap_sec``.

    session_id = running count of gaps > threshold — the classic
    sessionization window pattern; stable (ts, turn_idx) ordering is the
    engine's secondary-sort invariant (reference geometric slice sort:
    zrad/io/dicom.py:89-100).
    """
    w = _conv_window()
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = ts_us - F.lag(ts_us).over(w)
    df = df.withColumn("gap_sec", (gap_us / 1e6).cast("double"))
    new_sess = F.when(F.col("gap_sec") > F.lit(gap_seconds), 1).otherwise(0)
    running = Window.partitionBy("conv_id").orderBy(*_ORDER).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(new_sess).over(running).cast("int"))


def with_lag_lead(df: DataFrame, cols: list[str], offsets: tuple = (1,)) -> DataFrame:
    """Attach lag/lead columns for the given signal columns.

    The declarative counterpart of the kernel-side lag pairs (GLCM
    directions): ``<col>_lag<k>`` / ``<col>_lead<k>`` per offset.
    """
    w = _conv_window()
    for c in cols:
        for k in offsets:
            df = df.withColumn(f"{c}_lag{k}", F.lag(F.col(c), k).over(w))
            df = df.withColumn(f"{c}_lead{k}", F.lead(F.col(c), k).over(w))
    return df


def session_stats(df: DataFrame, gap_seconds: float) -> DataFrame:
    """Per-session aggregate block: bounds, turn count, mean signal.

    groupBy (conv_id, session_id) reuses the conv_id exchange produced by
    with_sessions (Catalyst recognises the co-partitioning).
    """
    s = with_sessions(df, gap_seconds)
    return s.groupBy("conv_id", "session_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("signal")).alias("signal_sum"),
        F.avg(F.col("signal")).alias("signal_mean"),
    )
