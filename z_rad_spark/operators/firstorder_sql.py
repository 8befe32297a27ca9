"""Declarative (pure-JVM) first-order feature plans.

The same 18 statistics / histogram formulas as kernels/firstorder.py
(reference: zrad/radiomics/intensity.py:218-324), expressed entirely with
groupBy/window/built-in aggregates — zero Python in the execution path.
This is the scale fast-path when only first-order families are requested:
partial aggregation (map-side combine) applies, and Catalyst prunes
columns down to (conv_id, ts, signal).

Shape: a broadcast range-join against the tiny cutoff grid expands rows
per cutoff; all later joins are on (conv_id, as_of), co-partitioned after
one exchange, so AQE fuses them without extra shuffles.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .asof import cutoff_grid

SENTINEL = 1_000_000.0

KEYS = ["conv_id", "as_of"]


def _expand(df: DataFrame, spark: SparkSession, cutoffs: Iterable[str]) -> DataFrame:
    grid = cutoff_grid(spark, cutoffs)
    return df.join(F.broadcast(grid), F.col("ts") <= F.col("as_of"))


def stats_asof(
    df: DataFrame, spark: SparkSession, cutoffs: Iterable[str], signal_col: str = "signal"
) -> DataFrame:
    """18 intensity statistics per (conv_id, as_of), declaratively.

    One exchange total: the order-free window pass attaches the per-group
    mean/median/percentiles to every row, a second window projection over
    the SAME partitioning derives the trimmed mean (no re-shuffle — the
    rmad order contract: trimmed mean before its own deviation pass, as in
    the kernel), and the final groupBy on the same keys reuses the
    partitioning for everything else (mad/medad/central moments/rmad).
    """
    x = F.col(signal_col)
    rows = _expand(df.select("conv_id", "ts", signal_col), spark, cutoffs)

    w = Window.partitionBy(*KEYS)
    r = rows.select(
        *KEYS,
        x.alias("_x"),
        F.avg(x).over(w).alias("_mean"),
        F.percentile(x, F.lit(0.10)).over(w).alias("_p10"),
        F.percentile(x, F.lit(0.25)).over(w).alias("_p25"),
        F.percentile(x, F.lit(0.50)).over(w).alias("_med"),
        F.percentile(x, F.lit(0.75)).over(w).alias("_p75"),
        F.percentile(x, F.lit(0.90)).over(w).alias("_p90"),
    )
    trim = (F.col("_x") >= F.col("_p10")) & (F.col("_x") <= F.col("_p90"))
    r = r.withColumn("_tmean", F.avg(F.when(trim, F.col("_x"))).over(w))

    xx = F.col("_x")
    out = r.groupBy(*KEYS).agg(
        F.count(xx).alias("n"),
        F.first("_mean").alias("stat_mean"),
        F.var_pop(xx).alias("stat_var"),
        F.min(xx).alias("stat_min"),
        F.max(xx).alias("stat_max"),
        F.first("_p10").alias("stat_p10"),
        F.first("_p25").alias("_p25"),
        F.first("_med").alias("stat_median"),
        F.first("_p75").alias("_p75"),
        F.first("_p90").alias("stat_p90"),
        F.sum(xx * xx).alias("stat_energy"),
        F.sqrt(F.avg(xx * xx)).alias("stat_rms"),
        F.avg(F.abs(xx - F.col("_mean"))).alias("stat_mad"),
        F.avg(F.abs(xx - F.col("_med"))).alias("stat_medad"),
        F.avg(F.pow(xx - F.col("_mean"), 3)).alias("_m3"),
        F.avg(F.pow(xx - F.col("_mean"), 4)).alias("_m4"),
        F.avg(F.when(trim, F.abs(xx - F.col("_tmean")))).alias("stat_rmad"),
    )
    var = F.col("stat_var")
    out = out.select(
        *KEYS,
        F.col("n").cast("long").alias("n_turns"),
        "stat_mean",
        "stat_var",
        F.when(var == 0, 0.0).otherwise(F.col("_m3") / F.pow(var, 1.5)).alias("stat_skew"),
        F.when(var == 0, 0.0).otherwise(F.col("_m4") / (var * var) - 3).alias("stat_kurt"),
        "stat_median",
        "stat_min",
        "stat_p10",
        "stat_p90",
        "stat_max",
        (F.col("_p75") - F.col("_p25")).alias("stat_iqr"),
        (F.col("stat_max") - F.col("stat_min")).alias("stat_range"),
        "stat_mad",
        "stat_rmad",
        "stat_medad",
        F.when(F.col("stat_mean") == 0, SENTINEL)
        .otherwise(F.sqrt(var) / F.col("stat_mean"))
        .alias("stat_cov"),
        F.when(F.col("_p75") + F.col("_p25") == 0, SENTINEL)
        .otherwise((F.col("_p75") - F.col("_p25")) / (F.col("_p75") + F.col("_p25")))
        .alias("stat_qcod"),
        "stat_energy",
        "stat_rms",
    )
    return out


def fbn_grey_asof(
    df: DataFrame, spark: SparkSession, cutoffs: Iterable[str], n_bins: int, signal_col: str = "signal"
) -> DataFrame:
    """Leakage-safe FBN discretization per (conv_id, as_of): min/max come
    from the cutoff-filtered population only (discretization.py:117-137);
    a global min/max would be a temporal leak (SURVEY.md §4)."""
    x = F.col(signal_col)
    rows = _expand(df.select("conv_id", "ts", "turn_idx", signal_col), spark, cutoffs)
    w = Window.partitionBy(*KEYS)
    lo = F.min(x).over(w)
    hi = F.max(x).over(w)
    grey = (
        F.when(hi == lo, F.lit(1.0))
        .when(x == hi, F.lit(float(n_bins)))
        .otherwise(F.floor(n_bins * (x - lo) / (hi - lo)) + 1)
    )
    return rows.withColumn("grey", grey.cast("double"))


def hist_asof(
    df: DataFrame, spark: SparkSession, cutoffs: Iterable[str], n_bins: int, signal_col: str = "signal"
) -> DataFrame:
    """Histogram features per (conv_id, as_of) on FBN grey levels,
    declaratively: entropy, uniformity, mode (smallest level among maximal
    counts, matching np.unique+argmax), and the np.gradient max/min over
    per-level counts via lag/lead central differences
    (intensity.py:179-185, 284-324)."""
    g = fbn_grey_asof(df, spark, cutoffs, n_bins, signal_col)
    counts = g.groupBy(*KEYS, "grey").agg(F.count("*").cast("double").alias("c"))
    wk = Window.partitionBy(*KEYS)
    counts = counts.withColumn("total", F.sum("c").over(wk))
    counts = counts.withColumn("p", F.col("c") / F.col("total"))
    wl = Window.partitionBy(*KEYS).orderBy("grey")
    prev_c = F.lag("c").over(wl)
    next_c = F.lead("c").over(wl)
    grad = (
        F.when(prev_c.isNull() & next_c.isNull(), F.lit(None).cast("double"))
        .when(prev_c.isNull(), next_c - F.col("c"))
        .when(next_c.isNull(), F.col("c") - prev_c)
        .otherwise((next_c - prev_c) / 2)
    )
    counts = counts.withColumn("grad", grad)
    n_levels = F.count("*").over(wk)
    counts = counts.withColumn("n_levels", n_levels)

    mode_w = Window.partitionBy(*KEYS).orderBy(F.col("c").desc(), F.col("grey").asc())
    maxg_w = Window.partitionBy(*KEYS).orderBy(F.col("grad").desc(), F.col("grey").asc())
    ming_w = Window.partitionBy(*KEYS).orderBy(F.col("grad").asc(), F.col("grey").asc())
    counts = (
        counts.withColumn("rn_mode", F.row_number().over(mode_w))
        .withColumn("rn_maxg", F.row_number().over(maxg_w))
        .withColumn("rn_ming", F.row_number().over(ming_w))
    )
    agg = counts.groupBy(*KEYS).agg(
        (-F.sum(F.col("p") * F.log2("p"))).alias("ih_entropy"),
        F.sum(F.col("p") * F.col("p")).alias("ih_uniformity"),
        F.max(F.when(F.col("rn_mode") == 1, F.col("grey"))).alias("ih_mode"),
        F.max(F.when((F.col("rn_maxg") == 1) & (F.col("n_levels") > 1), F.col("grad"))).alias("ih_max_grad"),
        F.max(F.when((F.col("rn_maxg") == 1) & (F.col("n_levels") > 1), F.col("grey"))).alias("ih_max_grad_g"),
        F.max(F.when((F.col("rn_ming") == 1) & (F.col("n_levels") > 1), F.col("grad"))).alias("ih_min_grad"),
        F.max(F.when((F.col("rn_ming") == 1) & (F.col("n_levels") > 1), F.col("grey"))).alias("ih_min_grad_g"),
    )
    moments = g.groupBy(*KEYS).agg(
        F.avg("grey").alias("ih_mean"),
        F.var_pop("grey").alias("ih_var"),
        F.percentile(F.col("grey"), F.lit(0.5)).alias("ih_median"),
        F.min("grey").alias("ih_min"),
        F.max("grey").alias("ih_max"),
    )
    return moments.join(agg, KEYS)
