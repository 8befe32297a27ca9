"""Backfill / regrid: resample the irregular ts axis onto a regular grid.

The temporal analogue of Z-Rad's ImageResampler
(zrad/preprocessing/interpolation.py:65-146): NN == as-of
last-observation-carried-forward; Linear == interpolation between the
bracketing turns. Mask resampling's partial-volume threshold
(interpolation.py:149-230) maps to ``eligible_frac >= threshold`` over the
grid step.

Declarative shape: per-conversation grid via sequence()+explode (no
driver-side loops), then the union-tag as-of pattern for both the
backward (locf) and forward (nocb) carries — one exchange, two window
passes over the same sort order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def regular_grid(turns: DataFrame, step_seconds: int, key: str = "conv_id") -> DataFrame:
    """One row per (conv_id, grid_ts): the conversation's span snapped to a
    regular step. sequence() is evaluated JVM-side; explode is a generator,
    not a shuffle."""
    span = turns.groupBy(key).agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    step = F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
    return span.select(
        key,
        F.explode(
            F.sequence(
                F.date_trunc("minute", F.col("t0")),
                F.col("t1"),
                step,
            )
        ).alias("grid_ts"),
    )


def backfill(
    turns: DataFrame,
    step_seconds: int,
    value_col: str = "signal",
    method: str = "nn",
    key: str = "conv_id",
) -> DataFrame:
    """Resampled (conv_id, grid_ts, value) frame.

    method 'nn'     — last observation carried forward (as-of semantics);
    method 'linear' — interpolate between bracketing turns; exact hits and
                      one-sided edges fall back to the available side.
    """
    grid = regular_grid(turns, step_seconds, key)
    t = turns.select(
        F.col(key),
        F.col("ts").alias("_t"),
        F.lit(0).alias("_src"),
        F.col(value_col).cast("double").alias("_v"),
    )
    g = grid.select(
        F.col(key),
        F.col("grid_ts").alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(None).cast("double").alias("_v"),
    )
    u = t.unionByName(g)
    wb = Window.partitionBy(key).orderBy("_t", "_src").rowsBetween(Window.unboundedPreceding, 0)
    u = u.withColumn("prev_v", F.last("_v", ignorenulls=True).over(wb))
    u = u.withColumn(
        "prev_t", F.last(F.when(F.col("_src") == 0, F.col("_t")), ignorenulls=True).over(wb)
    )
    if method == "nn":
        out = u.filter(F.col("_src") == 1).select(
            key, F.col("_t").alias("grid_ts"), F.col("prev_v").alias(value_col)
        )
        return out
    if method != "linear":
        raise ValueError(f"bad backfill method {method}")
    # forward pass: first build value at or after the grid point. Grid rows
    # sort AFTER turn rows at equal _t (src 1 > 0), so an exact-ts turn is
    # picked up by the backward pass; the forward pass orders src DESC to
    # keep the symmetric inclusive behavior.
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").desc(), F.col("_src").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("next_v", F.last("_v", ignorenulls=True).over(wf))
    u = u.withColumn(
        "next_t", F.last(F.when(F.col("_src") == 0, F.col("_t")), ignorenulls=True).over(wf)
    )
    gsel = u.filter(F.col("_src") == 1)
    dt = F.unix_micros(F.col("next_t")) - F.unix_micros(F.col("prev_t"))
    frac = (F.unix_micros(F.col("_t")) - F.unix_micros(F.col("prev_t"))) / dt
    interp = (
        F.when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .when(dt == 0, F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return gsel.select(key, F.col("_t").alias("grid_ts"), interp.alias(value_col))


def backfill_eligible_frac(
    turns: DataFrame,
    step_seconds: int,
    threshold: float = 0.5,
    key: str = "conv_id",
) -> DataFrame:
    """MaskResampler analogue: fraction of eligible turns per grid step,
    thresholded to a boolean (interpolation.py:149-230, default 0.5)."""
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    bucketed = turns.withColumn(
        "grid_ts",
        F.timestamp_micros(
            (ts_us / (step_seconds * 1_000_000)).cast("long") * (step_seconds * 1_000_000)
        ),
    )
    agg = bucketed.groupBy(key, "grid_ts").agg(
        F.avg(F.col("eligible").cast("double")).alias("eligible_frac")
    )
    return agg.withColumn("eligible_bin", (F.col("eligible_frac") >= threshold).cast("boolean"))
