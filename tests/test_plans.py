"""Physical-plan invariants for the scale paths: the properties that make
an operator survive a 100x scale-up are plan shapes, not values — pin
them so a refactor that silently degrades the plan (a lost broadcast, a
surprise nested loop, a filter that stopped reaching the scan) fails CI
even while values stay correct.

Plan strings come from queryExecution().executedPlan() after an action-
free analysis; AQE leaves the asserted markers visible in the initial
plan. Assertions are deliberately coarse (marker present/absent, counts
bounded) so they survive Spark version cosmetics.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=50):
    return spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} the and of common words here", f"src{i % 4}")
         for i in range(n)],
        "doc_id long, text string, source string",
    )


def test_quality_rules_has_no_exchange(spark):
    """The rule gate is a pure narrow map — it must stream through a scan
    with zero shuffles at any scale."""
    from z_rad_spark.operators.curation import gopher_quality_rules

    assert "Exchange" not in _plan(gopher_quality_rules(_docs(spark)))


def test_source_reputation_broadcasts_the_per_source_frame(spark):
    """The domain-level frame is tiny; the join back onto documents must
    be a broadcast, never a shuffled sort-merge join."""
    from z_rad_spark.operators.curation import source_reputation

    plan = _plan(source_reputation(_docs(spark)))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_no_nested_loop(spark):
    """Gram overlap is an equi-join on the gram key — a refactor that
    degrades it to a nested loop would be quadratic at corpus scale."""
    from z_rad_spark.operators.curation import decontaminate

    docs = _docs(spark)
    plan = _plan(decontaminate(docs.where("doc_id % 5 != 0"), docs.where("doc_id % 5 = 0")))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shard_pack_has_no_global_sort_of_documents(spark):
    """The prefix sum must stay two-pass: per-bucket windows + a tiny
    offset frame. A single global window would show as one Sort over an
    Exchange SinglePartition of the full document set."""
    from z_rad_spark.operators.curation import shard_pack

    docs = spark.range(500).withColumnRenamed("id", "doc_id").withColumn(
        "n_tokens", F.lit(10).cast("long")
    )
    plan = _plan(shard_pack(docs, budget=100))
    # the only SinglePartition exchange allowed is the 256-row offset frame
    # (input: a bare Range scan), never the document side (project over range)
    assert "BroadcastHashJoin" in plan  # offsets joined back via broadcast
    for frag in plan.split("Exchange SinglePartition")[1:]:
        head = frag.strip().splitlines()
        # the subtree below the exchange is the per-bucket totals aggregate
        assert any("HashAggregate" in ln for ln in head[:4]), plan


def test_filter_pushdown_reaches_parquet_scan(spark, tmp_path):
    """Predicate + column pruning must reach the scan: a 2-column
    projection with a filter reads neither all columns nor all rows."""
    p = str(tmp_path / "ev.parquet")
    spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 9).alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
    ).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("user_id") == 3).select("event_id", "user_id")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "IsNotNull(user_id)" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "value" not in read_schema and "event_type" not in read_schema


def test_hashed_embedding_single_shuffle(spark):
    """One explode + one map-side-combined groupBy: exactly one Exchange
    (hashpartitioning on the doc key)."""
    from z_rad_spark.operators.text import hashed_embedding

    plan = _plan(hashed_embedding(_docs(spark), dims=8))
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()  # map-side partial aggregation present
