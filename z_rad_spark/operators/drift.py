"""Sequential change detection over conversation signal streams.

A 100 TB training-data pipeline monitors its per-source quality signals
for DRIFT (a scraper change, a contaminated dump, a model-version bump
in synthetic data) — the classic tool is the one-sided CUSUM chart
(Page, Biometrika 1954): alarm when the cumulative excess of a signal
over its target drifts past a threshold.

The textbook recursion ``s_t = max(0, s_{t-1} + (x_t - target - slack))``
looks inherently sequential, but has the closed form

    s_t = P_t - min(0, min_{j<=t} P_j),   P_t = prefix-sum of deviations

so the whole chart is TWO running window aggregates (prefix sum +
running min) under the engine's stable (ts, turn_idx) order — one hash
exchange on conv_id, one sort, whole-stage codegen, no fold, no UDF.
That closed form is what makes the operator viable at 10^12 turns: the
per-row recursion would force an ordered per-key fold (collect_list or
a stateful UDF); the window form is the same single Exchange every
other per-conversation operator in the engine rides.

For integer-valued signals and a dyadic-rational target+slack every
intermediate is exact in binary floating point, so the SQL oracle
replays alarms bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ORDER = ("ts", "turn_idx")


def with_cusum(
    df: DataFrame,
    target: float = 5.0,
    slack: float = 0.5,
    threshold: float = 8.0,
    signal_col: str = "signal",
) -> DataFrame:
    """Per-turn one-sided (upper) CUSUM statistic and alarm flag.

    Adds: cusum double (s_t), cusum_alarm boolean (s_t > threshold).
    """
    run = (
        Window.partitionBy("conv_id")
        .orderBy(*_ORDER)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = F.col(signal_col).cast("double") - F.lit(float(target + slack))
    p = F.sum(dev).over(run)
    run_min = F.min(p).over(run)
    s = p - F.least(F.lit(0.0), run_min)
    return df.withColumn("cusum", s).withColumn(
        "cusum_alarm", s > F.lit(float(threshold))
    )


def cusum_summary(
    df: DataFrame,
    target: float = 5.0,
    slack: float = 0.5,
    threshold: float = 8.0,
    signal_col: str = "signal",
) -> DataFrame:
    """Per-conversation CUSUM monitoring summary: alarm count, chart
    maximum, and the first alarm's timestamp (epoch micros; NULL when
    the chart never crosses the threshold). One groupBy over the
    windowed frame — the exchange is shared with the window sort.

    Output: (conv_id, n_turns long, n_alarms long, max_cusum double,
    first_alarm_us long).
    """
    charted = with_cusum(df, target, slack, threshold, signal_col)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return charted.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.col("cusum_alarm").cast("long")).cast("long").alias("n_alarms"),
        F.max("cusum").alias("max_cusum"),
        F.min(F.when(F.col("cusum_alarm"), ts_us)).cast("long").alias("first_alarm_us"),
    )


def psi_drift(
    df: DataFrame,
    split_ts: str,
    signal_col: str = "signal",
    n_bins: int = 9,
    group_col: str = "role",
) -> DataFrame:
    """Population Stability Index between the distribution of an
    integer-binned signal BEFORE a cutoff (reference window) and AT/AFTER
    it (monitoring window), per group — the standard drift score a
    pipeline tracks per source/model-version alongside the CUSUM chart:

        PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

    with add-one (Laplace) smoothing so empty bins stay finite. The
    conventional bands: <0.1 stable, 0.1-0.25 drifting, >=0.25 shifted.

    Scale + determinism shape: ONE aggregation pass computes all
    2*n_bins conditional counts (map-side partial, no bin explode), and
    the PSI is the FIXED-ORDER sum ``term_1 + ... + term_B`` over known
    bins — float addition order is structural, counts are exact
    integers, so the SQL oracle replays the score bit-for-bit (same
    contract as rrf_fuse). Bins are the integer signal values 1..n_bins.

    Output: (group_col, n_ref long, n_cur long, psi double, drift_band
    string).
    """
    x = F.col(signal_col).cast("int")
    is_ref = F.col("ts").cast("timestamp") < F.lit(split_ts).cast("timestamp")
    aggs = [
        F.count(F.when(is_ref, 1)).alias("n_ref"),
        F.count(F.when(~is_ref, 1)).alias("n_cur"),
    ]
    for b in range(1, n_bins + 1):
        aggs.append(F.count(F.when(is_ref & (x == b), 1)).alias(f"_r{b}"))
        aggs.append(F.count(F.when(~is_ref & (x == b), 1)).alias(f"_c{b}"))
    g = df.groupBy(group_col).agg(*aggs)
    nr = (F.col("n_ref") + F.lit(n_bins)).cast("double")
    nc = (F.col("n_cur") + F.lit(n_bins)).cast("double")
    psi = None
    for b in range(1, n_bins + 1):
        p = (F.col(f"_r{b}") + F.lit(1)).cast("double") / nr
        q = (F.col(f"_c{b}") + F.lit(1)).cast("double") / nc
        term = (p - q) * F.log(p / q)
        psi = term if psi is None else psi + term
    band = (
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "drifting")
        .otherwise("shifted")
    )
    return (
        g.withColumn("psi", psi)
        .withColumn("drift_band", band)
        .select(group_col, "n_ref", "n_cur", "psi", "drift_band")
    )
