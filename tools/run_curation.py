#!/usr/bin/env python
"""Production entry point: end-to-end corpus curation as a Spark job —
the training-data twin of run_extract.py.

Pipeline (each stage a declarative plan over the previous one)::

    documents
      -> Gopher rule gate          (quality_rules; narrow, no shuffle)
      -> repetition filter         (dup 2-gram fraction cap; narrow)
      -> [--max-dup-span-frac] duplicate 8-gram span coverage gate
      -> [--min-classifier-prob] hashed linear quality classifier gate
                                   (model-based filter; pure map)
      -> [--max-ppl] LM perplexity gate (--lm unigram|bigram)
      -> exact dedup               (md5 canonical keeper; 1 shuffle)
      -> [--near-dup] MinHash+LSH near-dup clusters; survivor per
                      cluster by --survivor-policy (min-id | longest)
      -> decontamination           (word 3-gram overlap vs --benchmark-mod
                                    held-out subset; gram equi-join)
      -> [--dsir-target-sources] DSIR importance-weight floor
      -> [--mix] domain-mixture sampling toward --mix-budget
      -> deterministic hash split  (train/val/test; zero shuffle)
      -> token-budget shard packing per split (two-pass prefix sum)
      -> parquet partitioned by (split), ordered by shard

Run locally::

    python tools/run_curation.py --input /root/testdata/sf0.01 \
        --output /tmp/curated --budget 2000

or via spark-submit with ``--py-files`` of a ``z_rad_spark/`` zip, same
as run_extract.py. Resumability: the output manifest records the input
snapshot id + parameters; a re-run with both unchanged is skipped
(single-pass job — the bucketed per-partition resume of run_extract
does not compose with the global prefix sum in shard packing).

Stage boundaries are lineage CUTS (``localCheckpoint``), not caches:
every corpus-dependent stage references its input frame several times,
so without truncation the analyzed logical plan grows multiplicatively
with the number of chained stages and Catalyst analysis itself becomes
the bottleneck (persist() does not help — cache substitution runs
after analysis). On a cluster, swap ``localCheckpoint()`` for
``checkpoint(dir)`` or an intermediate table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = "_curation_manifest.json"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="sf dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark-mod", type=int, default=97,
                    help="doc_id %% MOD == 0 is the held-out benchmark subset")
    ap.add_argument("--max-dup-2gram", type=float, default=0.3)
    ap.add_argument("--min-stop-hits", type=int, default=1,
                    help="Gopher gate: distinct marker stopwords required")
    ap.add_argument("--budget", type=int, default=2000, help="tokens per shard")
    ap.add_argument("--splits", default="train:0.8,val:0.1,test:0.1")
    ap.add_argument("--near-dup", action="store_true",
                    help="also drop MinHash+LSH near-duplicate cluster members")
    ap.add_argument("--survivor-policy", choices=("min-id", "longest"),
                    default="min-id",
                    help="which near-dup cluster member survives: the "
                         "smallest doc_id (default) or the longest "
                         "document, ties to the smallest id "
                         "(dedup.dup_survivors)")
    ap.add_argument("--max-dup-span-frac", type=float, default=None,
                    help="drop docs whose duplicate 8-gram span coverage "
                         "exceeds this fraction (Lee et al. substring-dedup gate)")
    ap.add_argument("--min-classifier-prob", type=float, default=None,
                    help="model-based filter: keep docs whose hashed-linear "
                         "classifier keep-probability is >= this")
    ap.add_argument("--max-ppl", type=float, default=None,
                    help="perplexity filter: keep docs with LM ppl <= this")
    ap.add_argument("--lm", choices=("unigram", "bigram"), default="unigram",
                    help="which LM scores --max-ppl")
    ap.add_argument("--dsir-target-sources", default=None,
                    help="comma list of sources defining the DSIR target "
                         "domain; keeps docs with logw >= --dsir-min-logw")
    ap.add_argument("--dsir-min-logw", type=float, default=0.0)
    ap.add_argument("--mix", default=None,
                    help="domain-mixture weights 'src0:3,src1:1,...'; "
                         "applied with --mix-budget before splitting")
    ap.add_argument("--mix-budget", type=float, default=0.5)
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--resume", action="store_true",
                    help="skip the run when the manifest matches input snapshot + params")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from z_rad_spark.checkpoint import input_snapshot_id
    from z_rad_spark.operators.curation import (
        decontaminate,
        gopher_quality_rules,
        repetition_stats,
        shard_pack,
    )
    from z_rad_spark.operators.dedup import exact_dedup, hash_split
    from z_rad_spark.session import get_spark

    fractions = {}
    for part in args.splits.split(","):
        name, frac = part.split(":")
        fractions[name] = float(frac)

    params = {
        "benchmark_mod": args.benchmark_mod,
        "max_dup_2gram": args.max_dup_2gram,
        "min_stop_hits": args.min_stop_hits,
        "budget": args.budget,
        "splits": args.splits,
        "near_dup": bool(args.near_dup),
        "survivor_policy": args.survivor_policy,
        "max_dup_span_frac": args.max_dup_span_frac,
        "min_classifier_prob": args.min_classifier_prob,
        "max_ppl": args.max_ppl,
        "lm": args.lm,
        "dsir_target_sources": args.dsir_target_sources,
        "dsir_min_logw": args.dsir_min_logw,
        "mix": args.mix,
        "mix_budget": args.mix_budget,
    }
    snap = input_snapshot_id(args.input)
    mpath = os.path.join(args.output, MANIFEST)
    if args.resume and os.path.exists(mpath):
        with open(mpath) as fh:
            prev = json.load(fh)
        if prev.get("snapshot_id") == snap and prev.get("params") == params:
            print(json.dumps({"skipped": True, "manifest": prev}))
            return

    spark = get_spark("z_rad_curation", cores=args.cores)
    t0 = time.time()
    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    counts = {"input": docs.count()}

    gated = (
        gopher_quality_rules(docs, min_stop_hits=args.min_stop_hits)
        .where(F.col("pass_gopher"))
        .select(docs.columns)
    )
    gated = (
        repetition_stats(gated)
        .where(F.col("dup_2gram_frac") <= args.max_dup_2gram)
        .select(docs.columns)
    )
    # Each optional gate below is CORPUS-DEPENDENT (n-gram doc
    # frequencies, LM counts) and references the previous frame several
    # times, so the ANALYZED logical plan grows multiplicatively with
    # the number of chained stages. persist() does NOT fix that: cache
    # substitution happens after analysis, so Catalyst still walks the
    # exponentially expanded tree on every downstream action (observed:
    # 3 gates + DSIR never finished at sf0.001 — pure driver-side
    # analysis burn). localCheckpoint() TRUNCATES the lineage at a
    # materialized RDD, which bounds every later plan at one leaf per
    # stage. On a real cluster the same boundary is df.checkpoint(dir)
    # or an intermediate table between mega-stages — the standard shape
    # for production curation pipelines.
    if args.max_dup_span_frac is not None:
        from z_rad_spark.operators.dedup import dup_span_stats

        spans = dup_span_stats(gated, n=8).where(
            F.col("dup_frac") <= args.max_dup_span_frac
        )
        gated = gated.join(spans.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
    if args.min_classifier_prob is not None:
        from z_rad_spark.operators.curation import quality_classifier

        scored = quality_classifier(gated).where(
            F.col("prob") >= args.min_classifier_prob
        )
        gated = gated.join(scored.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
    if args.max_ppl is not None:
        from z_rad_spark.operators.curation import bigram_logprob, unigram_logprob

        lm = bigram_logprob if args.lm == "bigram" else unigram_logprob
        ok = lm(gated).where(F.col("ppl") <= args.max_ppl)
        gated = gated.join(ok.select("doc_id"), "doc_id", "left_semi")
    # one narrow pass feeds every later stage: cut + materialize here
    gated = gated.localCheckpoint()
    counts["after_quality"] = gated.count()

    keepers = exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
    deduped = gated.join(keepers, "doc_id", "left_semi")
    if args.near_dup:
        if args.survivor_policy == "longest":
            from z_rad_spark.operators.dedup import dup_survivors

            surv = dup_survivors(gated)
            losers = surv.where(~F.col("is_survivor")).select("doc_id")
        else:
            from z_rad_spark.operators.dedup import dup_clusters

            members = dup_clusters(gated)  # (doc_id, cluster_id) for LSH-linked docs
            keep = members.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
            losers = members.join(keep, ["cluster_id", "doc_id"], "left_anti").select("doc_id")
        deduped = deduped.join(losers, "doc_id", "left_anti")
    deduped = deduped.localCheckpoint()
    counts["after_dedup"] = deduped.count()

    bench = docs.where(F.col("doc_id") % args.benchmark_mod == 0)
    train_side = deduped.where(F.col("doc_id") % args.benchmark_mod != 0)
    contam = decontaminate(train_side, bench).where(~F.col("contaminated")).select("doc_id")
    clean = train_side.join(contam, "doc_id", "left_semi").localCheckpoint()
    counts["after_decontamination"] = clean.count()

    if args.dsir_target_sources:
        from z_rad_spark.operators.curation import dsir_weights

        tgt_sources = [s.strip() for s in args.dsir_target_sources.split(",")]
        target = docs.where(F.col("source").isin(tgt_sources))
        scored = dsir_weights(clean, target).where(
            F.col("logw") >= args.dsir_min_logw
        )
        clean = clean.join(scored.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
        counts["after_dsir"] = clean.count()

    if args.mix:
        from z_rad_spark.operators.curation import domain_mix_sample

        weights = {}
        for part in args.mix.split(","):
            name, w = part.split(":")
            weights[name.strip()] = float(w)
        mixed = domain_mix_sample(clean, weights, args.mix_budget).where(
            F.col("kept") == 1
        )
        clean = clean.join(mixed.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
        counts["after_mix"] = clean.count()

    split_docs = hash_split(clean, fractions)
    packed = shard_pack(
        split_docs.withColumn(
            "n_tokens",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("long"),
        ),
        budget=args.budget,
        token_col="n_tokens",
        group_col="split",
    )
    out = packed.select(
        "doc_id", "text", "source", "split", "n_tokens", "shard_id", "cum_before"
    )
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    written = spark.read.parquet(args.output)
    counts["written"] = written.count()
    counts["per_split"] = {
        r["split"]: r["n"] for r in written.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    manifest = {
        "snapshot_id": snap,
        "params": params,
        "counts": counts,
        "wall_sec": round(time.time() - t0, 3),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
