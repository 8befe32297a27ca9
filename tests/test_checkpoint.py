"""Snapshot-id plumbing for resumable runs (checkpoint.py).

The resume contract keys ONLY on the opaque ``snapshot_id`` string passed
into ``run_resumable`` — never on how it was derived. These tests inject
ids directly (as an Iceberg ``table.currentSnapshot().snapshotId`` would
be), proving the parquet-dir -> Iceberg swap is a one-function change:
replace ``input_snapshot_id`` and nothing else moves.
"""

import os

from pyspark.sql import functions as F


def _builder(spark, calls):
    def build_df(bucket, n_buckets):
        calls.append(bucket)
        return (
            spark.range(20)
            .withColumn("conv_id", F.concat(F.lit("c"), F.col("id")))
            .where(F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)) == bucket)
            .select("conv_id", (F.col("id") * 2).alias("v"))
        )

    return build_df


def test_resume_skips_on_matching_injected_snapshot_id(spark, tmp_path):
    from z_rad_spark.checkpoint import run_resumable

    out = str(tmp_path / "out")
    calls = []
    m1 = run_resumable(spark, _builder(spark, calls), out, snapshot_id="snap-A", n_buckets=4)
    assert m1["computed"] == 4 and m1["skipped"] == 0
    assert m1["rows_written"] == 20

    # same snapshot id -> every bucket skipped, builder never invoked
    calls2 = []
    m2 = run_resumable(spark, _builder(spark, calls2), out, snapshot_id="snap-A", n_buckets=4)
    assert m2["computed"] == 0 and m2["skipped"] == 4
    assert calls2 == []

    # a NEW snapshot id (Iceberg: the table advanced) -> full recompute
    calls3 = []
    m3 = run_resumable(spark, _builder(spark, calls3), out, snapshot_id="snap-B", n_buckets=4)
    assert m3["computed"] == 4 and m3["skipped"] == 0

    # output stays readable and complete after the overwrite cycle
    got = spark.read.parquet(out).count()
    assert got == 20


def test_resume_recomputes_only_manifestless_buckets(spark, tmp_path):
    """Kill-9-between-write-and-manifest costs exactly one bucket."""
    from z_rad_spark.checkpoint import _manifest_dir, run_resumable

    out = str(tmp_path / "out")
    run_resumable(spark, _builder(spark, []), out, snapshot_id="snap-A", n_buckets=4)
    # simulate the crash window: data committed, manifest lost
    victim = sorted(os.listdir(_manifest_dir(out)))[1]
    os.remove(os.path.join(_manifest_dir(out), victim))

    calls = []
    m = run_resumable(spark, _builder(spark, calls), out, snapshot_id="snap-A", n_buckets=4)
    assert m["computed"] == 1 and m["skipped"] == 3
    assert calls == [1]
    assert spark.read.parquet(out).count() == 20


def test_parquet_snapshot_fallback_tracks_input_changes(tmp_path):
    """The parquet-dir derivation (the non-Iceberg stand-in) changes when
    and only when the input files change."""
    from z_rad_spark.checkpoint import input_snapshot_id

    d = tmp_path / "data"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"xx")
    s1 = input_snapshot_id(str(d))
    assert s1 == input_snapshot_id(str(d))
    (d / "b.parquet").write_bytes(b"yy")
    assert input_snapshot_id(str(d)) != s1
