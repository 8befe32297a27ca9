"""Backfill / regrid: resample the irregular ts axis onto a regular grid.

The temporal analogue of Z-Rad's ImageResampler
(zrad/preprocessing/interpolation.py:24-146, the full NN / Linear /
BSpline / Gaussian method set): NN == as-of last-observation-carried-
forward; Linear == interpolation between the bracketing turns; cubic ==
Catmull-Rom Hermite through the two bracketing turns per side (the
BSpline-order-3 analogue on an irregular axis); gaussian ==
kernel-weighted mean of all turns within a truncation radius (the
sitkGaussian analogue). Mask resampling's partial-volume threshold
(interpolation.py:149-230) maps to ``eligible_frac >= threshold`` over the
grid step.

Declarative shape: per-conversation grid via sequence()+explode (no
driver-side loops), then the union-tag as-of pattern for the backward
(locf) and forward (nocb) carries — one exchange, two window passes over
the same sort order (cubic rides the SAME two passes: the second-
bracketing values are lag/lead columns precomputed on the turns side, so
they are carried by additional running-lasts over the existing sorts, no
extra shuffle). The gaussian path is scatter-shaped instead: each turn
emits its (bounded) set of covered grid cells, one groupBy(key, cell)
sums the kernel-weighted contributions with map-side combine, and a left
join onto the grid restores empty cells as NULL — no per-cell window over
raw turns, so a 10^12-turn conversation never concentrates in one task.
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
                      one-sided edges fall back to the available side;
    method 'cubic'  — non-uniform Catmull-Rom (cubic Hermite through the
                      bracketing turns, tangents from the second
                      bracketing turn per side; the BSpline-order-3
                      analogue, interpolation.py:24-54). Missing outer
                      neighbours degrade the tangent to the secant;
                      missing bracketing values fall back like 'linear'.
    """
    if method not in ("nn", "linear", "cubic"):
        raise ValueError(f"bad backfill method {method}")
    grid = regular_grid(turns, step_seconds, key)
    w_t = Window.partitionBy(key).orderBy("ts", "turn_idx") if "turn_idx" in turns.columns \
        else Window.partitionBy(key).orderBy("ts")
    tv = turns.select(
        F.col(key),
        F.col("ts"),
        F.col(value_col).cast("double").alias("_v0"),
        *([F.col("turn_idx")] if "turn_idx" in turns.columns else []),
    )
    if method == "cubic":
        tv = tv.withColumn("_pv2", F.lag("_v0").over(w_t)).withColumn(
            "_pt2", F.lag("ts").over(w_t)
        ).withColumn("_nv2", F.lead("_v0").over(w_t)).withColumn(
            "_nt2", F.lead("ts").over(w_t)
        )
    extra = ["_pv2", "_pt2", "_nv2", "_nt2"] if method == "cubic" else []
    t = tv.select(
        F.col(key),
        F.col("ts").alias("_t"),
        F.lit(0).alias("_src"),
        F.col("_v0").alias("_v"),
        *[F.col(c) for c in extra],
    )
    g = grid.select(
        F.col(key),
        F.col("grid_ts").alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(None).cast("double").alias("_v"),
        *[
            F.lit(None).cast("double" if c.endswith("v2") else "timestamp").alias(c)
            for c in extra
        ],
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
    if method == "cubic":
        # second bracketing turn per side: the latest turn <= grid carries
        # its own lag (= second-latest turn's value/ts) — a running last
        # over the SAME sort, no extra shuffle; symmetric with lead
        u = u.withColumn(
            "prev2_v", F.last(F.when(F.col("_src") == 0, F.col("_pv2")), ignorenulls=True).over(wb)
        ).withColumn(
            "prev2_t", F.last(F.when(F.col("_src") == 0, F.col("_pt2")), ignorenulls=True).over(wb)
        ).withColumn(
            "next2_v", F.last(F.when(F.col("_src") == 0, F.col("_nv2")), ignorenulls=True).over(wf)
        ).withColumn(
            "next2_t", F.last(F.when(F.col("_src") == 0, F.col("_nt2")), ignorenulls=True).over(wf)
        )
    gsel = u.filter(F.col("_src") == 1)

    def sec(c):
        return F.unix_micros(F.col(c)).cast("double") / F.lit(1e6)

    t0, t1, t2, t3 = sec("prev2_t"), sec("prev_t"), sec("next_t"), sec("next2_t")
    tg = F.unix_micros(F.col("_t")).cast("double") / F.lit(1e6)
    v0, v1, v2, v3 = F.col("prev2_v"), F.col("prev_v"), F.col("next_v"), F.col("next2_v")
    dt_us = F.unix_micros(F.col("next_t")) - F.unix_micros(F.col("prev_t"))
    if method == "linear":
        frac = (F.unix_micros(F.col("_t")) - F.unix_micros(F.col("prev_t"))) / dt_us
        interp = (
            F.when(v1.isNull(), v2)
            .when(v2.isNull(), v1)
            .when(dt_us == 0, v1)
            .otherwise(v1 + (v2 - v1) * frac)
        )
        return gsel.select(key, F.col("_t").alias("grid_ts"), interp.alias(value_col))
    # cubic Hermite on the irregular axis (CASE guards keep the divisions
    # lazy — ANSI mode throws on x/0): finite-difference tangents, secant
    # fallback when the outer neighbour is missing or time-coincident
    h = t2 - t1
    secant = F.when(h != 0, (v2 - v1) / h)
    m1 = F.when(v0.isNotNull() & (t2 - t0 != 0), (v2 - v0) / (t2 - t0)).otherwise(secant)
    m2 = F.when(v3.isNotNull() & (t3 - t1 != 0), (v3 - v1) / (t3 - t1)).otherwise(secant)
    s = F.when(h != 0, (tg - t1) / h)
    s2 = s * s
    s3 = s2 * s
    h00 = 2 * s3 - 3 * s2 + 1
    h10 = s3 - 2 * s2 + s
    h01 = -2 * s3 + 3 * s2
    h11 = s3 - s2
    interp = (
        F.when(v1.isNull(), v2)
        .when(v2.isNull(), v1)
        .when(dt_us == 0, v1)
        .otherwise(h00 * v1 + h10 * h * m1 + h01 * v2 + h11 * h * m2)
    )
    return gsel.select(key, F.col("_t").alias("grid_ts"), interp.alias(value_col))


def backfill_gaussian(
    turns: DataFrame,
    step_seconds: int,
    sigma_seconds: float | None = None,
    radius_seconds: float | None = None,
    value_col: str = "signal",
    key: str = "conv_id",
) -> DataFrame:
    """Gaussian-kernel resampling (the sitkGaussian analogue,
    interpolation.py:24-54): each grid point gets the kernel-weighted
    mean of all turns within ``radius_seconds``, weights
    exp(-0.5 * (dt/sigma)^2). Defaults: sigma = step/2, radius = 3*sigma.

    Scale shape (scatter, not gather): each TURN emits its covered grid
    cells — a bounded explode of ~2*radius/step + 1 cells — and one
    groupBy(key, grid_ts) sums weighted contributions with map-side
    combine; the final left join restores in-span cells with no turn in
    radius as NULL rows. No window over raw turns keyed only by ``key``,
    so giant conversations spread across reducers by (key, cell).
    """
    sigma = float(sigma_seconds if sigma_seconds is not None else step_seconds / 2.0)
    radius = float(radius_seconds if radius_seconds is not None else 3.0 * sigma)
    step_us = int(step_seconds) * 1_000_000
    rad_us = int(radius * 1e6)
    span = turns.groupBy(key).agg(
        F.unix_micros(F.date_trunc("minute", F.min("ts")).cast("timestamp")).alias("_t0u")
    )
    t = turns.join(span, key).select(
        F.col(key),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_tu"),
        F.col(value_col).cast("double").alias("_v"),
        F.col("_t0u"),
    )
    # candidate cell indices (generous by one cell; the exact integer-us
    # radius predicate below decides membership, so double rounding in
    # the ceil/floor can never change the term set)
    n_lo = F.ceil((F.col("_tu") - rad_us - F.col("_t0u")) / F.lit(float(step_us))).cast("long") - 1
    n_hi = F.floor((F.col("_tu") + rad_us - F.col("_t0u")) / F.lit(float(step_us))).cast("long") + 1
    contrib = (
        t.select(key, "_tu", "_v", "_t0u", F.explode(F.sequence(n_lo, n_hi)).alias("_n"))
        .where(F.col("_n") >= 0)
        .withColumn("_gu", F.col("_t0u") + F.col("_n") * F.lit(step_us))
        .where(F.abs(F.col("_gu") - F.col("_tu")) <= F.lit(rad_us))
    )
    z = ((F.col("_gu") - F.col("_tu")).cast("double") / F.lit(1e6)) / F.lit(sigma)
    w = F.exp(F.lit(-0.5) * z * z)
    agg = (
        contrib.withColumn("_w", w)
        .groupBy(key, "_gu")
        .agg(F.sum(F.col("_w") * F.col("_v")).alias("_wv"), F.sum("_w").alias("_ws"))
    )
    # join back on the integer micro key: regular_grid's grid_ts may be
    # TIMESTAMP_NTZ depending on the source, timestamp_micros always
    # builds TIMESTAMP — the long key sidesteps the tz-type mismatch
    grid = regular_grid(turns, step_seconds, key).withColumn(
        "_gu", F.unix_micros(F.col("grid_ts").cast("timestamp"))
    )
    out = grid.join(agg, [key, "_gu"], "left")
    val = F.when(F.col("_ws") != 0, F.col("_wv") / F.col("_ws"))
    return out.select(key, "grid_ts", val.alias(value_col))


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
