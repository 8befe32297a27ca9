"""Entity-level semi/anti join filters.

The reference keeps/drops whole patients based on ROI presence
(zrad/gui/_base_tab.py:93-121: instance lists are filtered to those with
the named structure before extraction). The transcript analogue: keep (or
drop) every turn of conversations that have at least one turn satisfying
an eligibility predicate — "features only for conversations that used a
tool" / "only conversations that never errored".

Scale shape: the eligible-key set is one distinct over the predicate
rows (map-side combine collapses it before the shuffle), and the
semi/anti join shuffles on ``conv_id`` — the engine's canonical key, so
plans that chain this with extraction or as-of joins reuse the exchange.
When the eligible set is small Spark's AQE converts the exchange to a
broadcast join at runtime; ``left_semi``/``left_anti`` never materialize
right-side columns, so no row widening either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def filter_conversations(
    df: DataFrame,
    predicate: Column,
    mode: str = "semi",
    key: str = "conv_id",
) -> DataFrame:
    """Keep rows of entities with (semi) / without (anti) >= 1 row
    matching ``predicate``."""
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be semi|anti, got {mode!r}")
    keys = df.where(predicate).select(key).distinct()
    return df.join(keys, key, "left_semi" if mode == "semi" else "left_anti")


def semi_eligible(df: DataFrame, predicate: Column, key: str = "conv_id") -> DataFrame:
    """Rows of conversations that HAVE an eligible turn (left_semi)."""
    return filter_conversations(df, predicate, "semi", key)


def anti_eligible(df: DataFrame, predicate: Column, key: str = "conv_id") -> DataFrame:
    """Rows of conversations with NO eligible turn (left_anti)."""
    return filter_conversations(df, predicate, "anti", key)
