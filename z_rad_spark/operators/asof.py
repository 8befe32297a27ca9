"""Sort-merge as-of join — the engine's point-in-time primitive.

Spark has no native as-of join; this implements the scalable
union-tag-and-last(ignorenulls) formulation:

1. union the build side (turns) and probe side (cutoffs) on the entity key
   with a source tag,
2. one hash exchange + ONE sort per partition on
   (key, t, src, tie-break) — a sort-merge shape, never a broadcast of the
   big side,
3. running ``last(value, ignorenulls=True)`` carries the latest build
   state forward; probe rows then hold exactly the state as of their
   timestamp (inclusive: build sorts before probe at equal t).

At 10^12-turn scale this is shuffle-optimal: a single exchange keyed by
conv_id, no join explosion, skew handled by AQE skew-split plus
operators/skew.py salting. Reference analogue: the implicit "whole image
at scan time" snapshot (SURVEY.md §0) made explicit.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def cutoff_grid(spark: SparkSession, cutoffs: Iterable[str]) -> DataFrame:
    """Tiny dimension of as-of cutoffs (always broadcast-joined)."""
    return spark.createDataFrame([(c,) for c in cutoffs], "as_of_str string").select(
        F.to_timestamp("as_of_str").alias("as_of")
    )


def expand_cutoffs(entities: DataFrame, grid: DataFrame) -> DataFrame:
    """entity x cutoff probe frame via broadcast cross join (grid is tiny)."""
    return entities.crossJoin(F.broadcast(grid))


def asof_join(
    turns: DataFrame,
    probes: DataFrame,
    value_cols: list[str],
    key: str = "conv_id",
    turns_ts: str = "ts",
    probe_ts: str = "as_of",
    tie_break: str = "turn_idx",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each probe row (key, probe_ts), attach the latest value_cols from
    the turn with the greatest (ts, tie_break) such that ts <= probe_ts.

    ``tolerance_seconds``: when set, a match older than the tolerance is
    treated as no match — values null, same as no prior turn. Staleness
    is judged PER VALUE COLUMN: because the running last(ignorenulls)
    forward-fills each column past newer turns whose column is NULL, the
    match each column is judged against is the latest turn where THAT
    column is non-null. This is deliberately stronger than pandas
    ``merge_asof(tolerance=...)``, which judges the whole ROW against the
    last matching turn's ts (the two coincide when value columns have no
    NULLs). The matched timestamps ride the same running-last pass, so
    the staleness check adds zero extra shuffles or sorts.

    Returns the probe rows + value columns (null when no prior turn).
    """
    probe_extra = [c for c in probes.columns if c not in (key, probe_ts)]
    t = turns.select(
        F.col(key),
        F.col(turns_ts).alias("_t"),
        F.lit(0).alias("_src"),
        F.col(tie_break).cast("long").alias("_tie"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_extra],
    )
    p = probes.select(
        F.col(key),
        F.col(probe_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.lit(2**62).cast("long").alias("_tie"),
        *[F.lit(None).cast(turns.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in probe_extra],
    )
    u = t.unionByName(p)
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_src", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if tolerance_seconds is not None:
        # staleness is judged PER COLUMN against the ts of the turn whose
        # value is actually carried: capture each column's matched ts
        # BEFORE the forward fill (last ignorenulls can carry a value
        # past newer turns whose column is NULL — judging against the
        # newest turn's ts would mark that stale value fresh)
        t_us = F.unix_micros(F.col("_t").cast("timestamp"))
        for c in value_cols:
            u = u.withColumn(
                f"_mt_{c}",
                F.last(
                    F.when((F.col("_src") == 0) & F.col(c).isNotNull(), t_us),
                    ignorenulls=True,
                ).over(w),
            )
    for c in value_cols:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        t_us = F.unix_micros(F.col("_t").cast("timestamp"))
        for c in value_cols:
            u = u.withColumn(
                c, F.when((t_us - F.col(f"_mt_{c}")) <= F.lit(tol_us), F.col(c))
            )
    return u.filter(F.col("_src") == 1).select(
        F.col(key), F.col("_t").alias(probe_ts), *probe_extra, *value_cols
    )


def asof_state(
    turns: DataFrame,
    spark: SparkSession,
    cutoffs: Iterable[str],
    value_cols: list[str],
    key: str = "conv_id",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """State of every conversation at every cutoff: grid expansion + as-of.

    Entities are enumerated from the turns themselves (distinct keys reuse
    the same hash partitioning)."""
    grid = cutoff_grid(spark, cutoffs)
    probes = expand_cutoffs(turns.select(key).distinct(), grid)
    return asof_join(
        turns, probes, value_cols, key=key, tolerance_seconds=tolerance_seconds
    )
