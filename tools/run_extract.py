#!/usr/bin/env python
"""Production entry point: point-in-time feature extraction as a Spark job.

Run locally::

    python tools/run_extract.py --input /root/testdata/sf0.01 \
        --output /tmp/features --cutoffs 2024-01-08 2024-01-15 \
        --families stats hist glcm --resume

or on a cluster (the package has no native deps, so --py-files a zip of
``z_rad_spark/`` is the whole deployment)::

    cd /root/repo && zip -qr /tmp/z_rad_spark.zip z_rad_spark
    spark-submit --py-files /tmp/z_rad_spark.zip tools/run_extract.py \
        --input <iceberg-table-or-parquet-dir> --output <dir> \
        --cutoffs 2024-01-08 ... [--master yarn ...]

Resumability (north rule): with ``--resume`` the job splits the entity
space into ``--buckets`` hash buckets; each finished bucket commits its
output partition (idempotent overwrite) plus a lineage manifest keyed by
the input snapshot id, and a re-run after a crash skips completed buckets
whose manifest matches the current snapshot (z_rad_spark/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="events parquet dir (sf dir) or transcripts parquet")
    ap.add_argument("--input-format", choices=["events", "transcripts"], default="events")
    ap.add_argument("--output", required=True)
    ap.add_argument("--cutoffs", nargs="+", required=True, help="as-of timestamps")
    ap.add_argument("--families", nargs="*", default=None, help="default: all")
    ap.add_argument("--signal", default="token_count")
    ap.add_argument("--gap-seconds", type=float, default=1800.0)
    ap.add_argument("--n-bins", type=int, default=None)
    ap.add_argument("--bin-size", type=float, default=None)
    ap.add_argument("--min-turns", type=int, default=3)
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--resume", action="store_true", help="bucketed resumable run with lineage manifests")
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from z_rad_spark.checkpoint import bucket_filter, input_snapshot_id, run_resumable
    from z_rad_spark.config import ALL_FAMILIES, FeatureConfig
    from z_rad_spark.extractor import extract_features
    from z_rad_spark.operators.skew import skew_metrics
    from z_rad_spark.session import get_spark
    from z_rad_spark.transcripts import load_transcripts

    spark = get_spark("z_rad_extract", cores=args.cores)
    if args.input_format == "events":
        df = load_transcripts(spark, args.input)
    else:
        df = spark.read.parquet(args.input)

    cfg = FeatureConfig(
        signal=args.signal,
        families=tuple(args.families) if args.families else ALL_FAMILIES,
        gap_seconds=args.gap_seconds,
        n_bins=args.n_bins,
        bin_size=args.bin_size,
        min_turns=args.min_turns,
    )

    t0 = time.time()
    metrics: dict = {"skew": skew_metrics(df)}
    if args.resume:
        snap = input_snapshot_id(args.input)

        def build(bucket: int, n_buckets: int):
            return extract_features(df.filter(bucket_filter(bucket, n_buckets)), cfg, args.cutoffs)

        metrics["run"] = run_resumable(spark, build, args.output, snap, n_buckets=args.buckets)
    else:
        out = extract_features(df, cfg, args.cutoffs)
        out.write.mode("overwrite").parquet(args.output)
        metrics["run"] = {"rows_written": spark.read.parquet(args.output).count()}

    n_turns = df.count()
    wall = time.time() - t0
    metrics["throughput_turns_per_sec"] = round(n_turns / wall, 1)
    metrics["wall_sec"] = round(wall, 3)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
