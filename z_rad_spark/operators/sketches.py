"""Sketch-based approximate aggregates — the 100 TB substitutes for
exact operators whose state would not fit or whose shuffle would
dominate:

* approx_distinct_by — HyperLogLog++ (``approx_count_distinct``):
  constant ~KB state per group vs an exact distinct's shuffle of every
  unique value. The exact twins are ``q_vocab`` / ``rare_token_stats``'s
  DF counts; at corpus scale the sketch is the only option for
  per-source vocabulary tracking.
* approx_quantiles_by — Greenwald-Khanna (``percentile_approx``):
  mergeable bounded-error quantiles, vs the exact rank-space percentile
  the first-order stats use (exact is right per-conversation where n is
  bounded; the sketch is for corpus-level distributions).

Sketch outputs are estimates: engine-portable SQL oracles cannot
hash-match them, so the driver records rows+schema only; the accuracy
contract lives in pytest (relative error vs the exact aggregate bounded
by the configured rsd / accuracy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group HLL++ distinct estimate plus exact row counts.

    One shuffle on the group key; partial sketches merge map-side, so
    the exchange carries one ~1.5/rsd^2-byte sketch per group per task
    regardless of value cardinality."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd).cast("long").alias("approx_distinct"),
        F.count("*").cast("long").alias("n_rows"),
    )


def approx_quantiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group Greenwald-Khanna quantile estimates (rank error <=
    1/accuracy). Mergeable: map-side partial sketches, one exchange on
    the group key."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(
            # stable names: 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
            "p" + f"{p * 100:g}".replace(".", "_")
        )
        for p in probabilities
    ]
    return df.groupBy(group_col).agg(*aggs)
