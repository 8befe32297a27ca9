"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also measures the north-rule scaling evidence when SPARK_GRAFT_SCALING=1:
the flagship extraction at local[8] vs local[32] on identical input,
reporting turns/sec at both and efficiency = (thr32 / thr8) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CUTOFFS = ["2024-01-08 00:00:00", "2024-01-15 00:00:00", "2024-01-22 00:00:00"]
GAP_SECONDS = 1800.0

HEADLINE = [
    "q_extract_full",
    "q_flagship_slice",
    "q_stats_asof",
    "q_hist_asof",
    "q_glcm",
    "q_glrlm_dist",
    "q_asof_state",
    "q_asof_enrich",
    "q_sessionize",
    "q_backfill_nn",
    "q_minhash_pairs",
    "q_dup_clusters",
    "q_cosine_topk",
    "q_ivf_topk",
    "q_dedup_exact",
    "q_corpus_clean",
    # round-2 additions (new rows vs BENCH_r01 — per-query comparisons
    # against r01 use the shared prefix above)
    "q_decontaminate",
    "q_shard_pack",
    "q_interval_join",
    "q_stream_window_stats",
    # round-3 additions: the 29-cutoff grid proves the compacted FBN path
    # at backfill scale; media exercises the Arrow decode stage
    "q_hist_daily",
    "q_media_features",
    # round-4 additions: compressed ANN serving (codes + coarse pruning)
    # and the inverted-index BM25 probe
    "q_ivfpq_topk",
    "q_bm25",
    # round-4 session-2 additions: point-in-time normalization at full
    # turn volume, the one-pass covariance statistics pass, and the
    # binary-quantized ANN baseline
    "q_expanding_zscore",
    "q_pca_cov",
    "q_hamming_topk",
    # round-4 session-6 additions: the classical feature-engineering
    # wave at full turn volume — the global broadcast encoder, the
    # per-conversation trend/autocorrelation aggregates, and the
    # rank-drift pre-aggregation shape
    "q_loo_encode",
    "q_signal_trend",
    "q_autocorr",
    "q_mw_drift",
    # session-6 late additions: the token-level explode cost class
    # (vocab growth) and the seven-way conversation-profile join
    "q_vocab_growth",
    "q_conv_features",
    # session-9 additions: the end-of-pipeline dedup cut (clusters +
    # survivor pick), the grouped-map MMR rerank, the (doc, token)
    # shuffle + ordered-fold cost class, and the stacked-window
    # sequential drift chart
    "q_dup_survivors",
    "q_mmr",
    "q_lexical_diversity",
    "q_page_hinkley",
    # late session-9: the two-pass TF/DF + per-bucket-fold embedding and
    # the cross-frame incremental LSH screen
    "q_tfidf_embed",
    "q_incremental_dedup",
    # r5 additions (VERDICT r4 #6): the heavy r4 newcomers previously
    # invisible to regression tracking, plus one salted texture path
    "q_semdedup",
    "q_bigram_lm",
    "q_ppl_buckets",
    "q_pack_sequences",
    "q_glcm_salted",
    # r5 session-2 additions: the two heavy newcomers — the 64-replicate
    # Poisson bootstrap (explode collapsed map-side) and the LSH-vs-
    # exact-Jaccard calibration eval (opt-in exact pair side)
    "q_bootstrap_ci",
    "q_lsh_recall",
    # r5 session-3 additions: the iterative flagship (4 join+agg rounds
    # over the bipartite graph), the tail-sensitive AD battery member,
    # the global-rank Kruskal-Wallis, and the register-replay HLL
    "q_pagerank",
    "q_ad_drift",
    "q_kruskal",
    "q_hll",
    # r5 session-4 additions: the Kneser-Ney scorer (four count tables
    # joined back onto the corpus triple — the heaviest LM cost class)
    # and the per-conversation PAVA kernel (grouped-map Arrow path at
    # full turn volume)
    "q_kn_ppl",
    "q_isotonic",
    # session-9 heavyweights: exact-Jaccard threshold sweep over the
    # LSH candidates, the id-ordered embedding fold pair, the
    # broadcast-grid point-in-time feature family, and the compacted
    # rank-pick latency matrix
    "q_dup_threshold_sweep",
    "q_mahalanobis",
    "q_anisotropy",
    "q_horizon_feats",
    "q_handoff_matrix",
]


def _run_queries(spark, sf_dir, passes: int = 2):
    """Per-query seconds, min over ``passes`` sequential sweeps.

    The sandbox host shows bimodal noise (identical runs swing 2x at
    minutes scale); a single sweep can land entirely inside a bad
    window. The min-of-2 is the standard noisy-host estimator of the
    plan's actual cost; both sweep totals are reported raw alongside.

    Timing action: an aggregate that references EVERY output column
    (count per column + the row count), not a bare ``count()``. Under
    ``count()`` Catalyst prunes whatever doesn't change cardinality —
    Window nodes (the as-of/sessionize/backfill family's entire
    operator), unique-key left joins and the pipelines behind them, and
    final-mile feature algebra — so 8 of 23 headline timings measured
    little more than the input scan (audited 2026-08-18, plan-level:
    q_stats_asof/q_hist_asof/q_hist_daily lost 5-8 Window + 2 Aggregate
    nodes, q_asof_state/q_asof_enrich/q_sessionize/q_backfill_nn lost
    every Window, q_shard_pack lost its prefix-sum).

    The unprunable action is ``count(1) + bit_xor(xxhash64(struct(all
    hashable cols)))``: the row hash references every column's VALUE
    (stronger than count(col)'s nullity — and what a downstream consumer
    actually pays for), while being ONE aggregate expression instead of
    161 — on the 161-column flagship the per-column count variant spent
    ~1.9 s extra purely in driver-side tree construction + analysis
    (measured r5, same warm session: 5.03 s vs 3.11 s; bare pruned
    count() 2.28 s), which is harness cost, not plan cost. Map-typed
    columns (not hashable by xxhash64) keep a count(col) each."""
    from pyspark.sql import functions as F
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict = {"_pass_totals": []}
    for _ in range(passes):
        total = 0.0
        for name in HEADLINE:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            hashable = [c for c, dt in df.dtypes if not dt.startswith("map")]
            maps = [c for c in df.columns if c not in hashable]
            aggs = [F.count(F.lit(1)).alias("n")]
            if hashable:
                aggs.append(
                    F.expr(
                        "bit_xor(xxhash64(struct("
                        + ", ".join(f"`{c}`" for c in hashable)
                        + ")))"
                    ).alias("h")
                )
            aggs += [F.count(df[c]).alias(f"m{i}") for i, c in enumerate(maps)]
            row = df.agg(*aggs).collect()[0]
            n = row["n"]
            sec = round(time.time() - t0, 3)
            total += sec
            if name not in timings or sec < timings[name]:
                timings[name] = sec
            timings.setdefault("_rows", {})[name] = n
        timings["_pass_totals"].append(round(total, 3))
    return timings


SCALING_REPL = int(os.environ.get("SPARK_GRAFT_SCALING_REPL", "24"))
# 256 = 8 scheduling waves at 32 cores: measured on this box, the 4-wave
# 128-bucket split leaves a straggler tail that caps utilization at ~0.6-0.7,
# while 256 lifts it to ~0.8 at identical total CPU (512 starts paying real
# Arrow-crossing overhead). Wave count, not bucket-size variance, is the
# utilization lever: per-bucket totals are CLT-even at ~280 convs/bucket.
SCALING_BUCKETS = int(os.environ.get("SPARK_GRAFT_SCALING_BUCKETS", "256"))


# process-tree CPU accounting shared by the scaling subprocess templates
_CPU_TREE_SRC = """
CLK = os.sysconf("SC_CLK_TCK")

def _tree_pids(root):
    pids, stack = [], [root]
    while stack:
        p = stack.pop()
        pids.append(p)
        try:
            for tid in os.listdir(f"/proc/{p}/task"):
                with open(f"/proc/{p}/task/{tid}/children") as f:
                    stack += [int(c) for c in f.read().split()]
        except OSError:
            pass
    return pids

def cpu_tree_seconds():
    total = 0.0
    for p in _tree_pids(os.getpid()):
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / CLK
        except OSError:
            pass
    return total
"""


DEDUP_SCALING_REPL = int(os.environ.get("SPARK_GRAFT_SCALING_DEDUP_REPL", "48"))
DEDUP_SCALING_PARTS = int(os.environ.get("SPARK_GRAFT_SCALING_DEDUP_PARTS", "128"))


def _dedup_throughput(cores: int, sf_dir: str, which: str) -> tuple[float, float, float]:
    """(seconds, docs/sec, cpu_sec) for one LLM-pipeline block workload on
    a fresh pinned local[cores] session — the north-rule evidence for the
    dedup/curation block (the flagship extract's twin, VERDICT r3 #8).

    The scaling input replicates the documents table DEDUP_SCALING_REPL
    times with a PER-REPLICA TOKEN SUFFIX: suffixed tokens make
    cross-replica shingles distinct, so each replica carries exactly the
    original corpus' dup structure and the workload (candidate pairs, CC
    edges) scales linearly with replication instead of quadratically
    (plain row replication would give every document R exact copies and
    measure a vastly denser — and unrealistic — problem).

    Fairness contract (same as the flagship harness): the replicated
    input is REPARTITIONED to the same fixed DEDUP_SCALING_PARTS at both
    levels (explode is narrow, so without it both levels inherit the
    parquet file's few input splits and local[32] runs narrow stages
    ~4-wide), and shuffle_partitions is pinned to the same value at both
    levels so the two runs execute the identical physical plan."""
    import subprocess

    # Measurement trap found 2026-08-18 (cost three bogus runs): timing
    # `dup_span_stats(big).count()` measures NOTHING — the operator ends
    # in a left join against an aggregate keyed on doc_id, so with no
    # output column referenced Catalyst's unique-key join elimination
    # drops the join AND the whole gram doc-frequency pipeline behind it
    # (verified: the count's optimizedPlan has no Join and no md5; the
    # output-sum's plan has both). Every dedup workload must therefore
    # aggregate the operator's OUTPUT columns, never bare count(), unless
    # the count itself forces the pipeline (inner joins / exploded pairs
    # do; minhash_pairs, dup_clusters and corpus_clean qualify).
    repl_boost: dict[str, int] = {}
    repeats: dict[str, int] = {}
    work_mult: dict[str, int] = {}

    bodies = {
        "dup_clusters": """
from z_rad_spark.operators.dedup import dup_clusters
out = lambda: dup_clusters(big, n=3, n_hashes=8, band_size=4, max_bucket=64).count()
""",
        "minhash_pairs": """
from z_rad_spark.operators.dedup import minhash_lsh_pairs
out = lambda: minhash_lsh_pairs(big, n=3, n_hashes=8, band_size=4, max_bucket=64).count()
""",
        "dup_spans": """
from z_rad_spark.operators.dedup import dup_span_stats
spans = dup_span_stats(big, n=8)
out = lambda: spans.selectExpr(
    "count(*) AS n", "sum(covered_tokens) AS c", "sum(n_tokens) AS t"
).collect()[0]["n"]
""",
        "corpus_clean": """
from pyspark.sql import functions as F
from z_rad_spark.operators.dedup import exact_dedup
from z_rad_spark.operators.text import with_quality, with_lang_id, with_token_counts
def _clean():
    q = with_quality(big)
    lang = with_lang_id(big).select("doc_id", "lang_pred")
    keep = exact_dedup(big).select(F.col("keep_id").alias("doc_id"))
    toks = with_token_counts(big).select("doc_id", "n_tokens_ws")
    return (
        q.join(keep, "doc_id").join(lang, "doc_id").join(toks, "doc_id")
        .where((F.col("n_tokens_ws") >= 5) & (F.col("stopword_ratio") >= 0.05)
               & (F.col("lang_pred") != "und"))
        .count()
    )
out = _clean
""",
    }
    code = f"""
import json, os, time, sys
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from pyspark.sql import functions as F
from z_rad_spark.session import get_spark
{_CPU_TREE_SRC}
spark = get_spark("bench_dedup_scaling", cores={cores},
                  shuffle_partitions={DEDUP_SCALING_PARTS})
docs = spark.read.parquet({sf_dir!r} + "/documents.parquet")
R = {DEDUP_SCALING_REPL * repl_boost.get(which, 1)}
big = docs.withColumn("_r", F.explode(F.array(*[F.lit(i) for i in range(R)])))
big = big.withColumn("doc_id", F.col("doc_id") * R + F.col("_r"))
big = big.withColumn(
    "text",
    F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit("x"), F.col("_r").cast("string"))),
        " ",
    ),
).drop("_r").repartition({DEDUP_SCALING_PARTS}).persist()
n_docs = big.count()
WORK_MULT = {work_mult.get(which, 1)}
{bodies[which]}
REPEATS = {repeats.get(which, 1)}
best = 1e18
best_cpu = 0.0
for _ in range(2):  # first pass doubles as warm; min keeps the clean one
    c0 = cpu_tree_seconds()
    t0 = time.time()
    for _r in range(REPEATS):
        rows = out()
    sec = time.time() - t0
    cpu = cpu_tree_seconds() - c0
    if sec < best:
        best, best_cpu = sec, cpu
print(json.dumps({{"sec": best, "cpu_sec": best_cpu,
                   "docs": n_docs * REPEATS * WORK_MULT, "rows": rows}}))
spark.stop()
"""
    p = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    return d["sec"], d["docs"] / d["sec"], d["cpu_sec"]


def _flagship_throughput(cores: int, sf_dir: str) -> tuple[float, float]:
    """(seconds, turns/sec) for the flagship point-in-time extraction on a
    fresh local[cores] session (each level runs in its own subprocess so
    the JVM/session is sized to that level).

    The scaling input is the sf dataset replicated SCALING_REPL times with
    suffixed conv_ids — identical at both parallelism levels, built by a
    single-branch explode so the plan stays one scan + one window (an
    N-way union adds seconds of serial planning that poison the ratio).
    Replication keeps the measured job compute-bound (kernel core-seconds
    >> fixed planning/scan overhead), which is the regime the 10^12-turn
    design point lives in; at raw sf0.1 the whole extraction finishes in
    ~3 core-seconds and any parallelism level just measures overhead."""
    import subprocess

    code = f"""
import json, os, time, sys
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from pyspark.sql import functions as F
from z_rad_spark.session import get_spark
from z_rad_spark.config import FeatureConfig
from z_rad_spark.extractor import extract_features
import __spark_entry__ as e

CLK = os.sysconf("SC_CLK_TCK")

def _tree_pids(root):
    # walk /proc children links: covers the JVM and every (reused)
    # pyspark worker daemon under it
    pids, stack = [], [root]
    while stack:
        p = stack.pop()
        pids.append(p)
        try:
            for tid in os.listdir(f"/proc/{{p}}/task"):
                with open(f"/proc/{{p}}/task/{{tid}}/children") as f:
                    stack += [int(c) for c in f.read().split()]
        except OSError:
            pass
    return pids

def cpu_tree_seconds():
    # utime+stime of this process and all live descendants (JVM executor
    # threads AND the Python kernel workers) — the actual compute consumed,
    # which wall-clock on a noisy-neighbour VM is not
    total = 0.0
    for p in _tree_pids(os.getpid()):
        try:
            with open(f"/proc/{{p}}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / CLK  # utime, stime
        except OSError:
            pass
    return total

spark = get_spark("bench_scaling", cores={cores})
# identical bucket count at BOTH parallelism levels: partitioning is a
# property of the dataset, not the cluster size — otherwise the 4N run
# does 4x the Arrow-boundary crossings and the CPU-work comparison is
# apples-to-oranges
spark.conf.set("spark.z_rad_spark.extract.buckets", "{SCALING_BUCKETS}")
t = e._t(spark, {sf_dir!r})
big = t.withColumn(
    "_r", F.explode(F.array(*[F.lit(i) for i in range({SCALING_REPL})]))
).withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_"), F.col("_r"))).drop("_r")
# cache the materialized input: the measured job is the ENGINE (exchange +
# kernel + aggregate) over an existing transcripts table, not the synthetic
# derivation pipeline; the cache is already partitioned, so the scan side
# stays parallel at both levels
big = big.persist()
n_turns = big.count()
cfg = FeatureConfig(eligible_roles=("user", "assistant", "tool"), gap_seconds={GAP_SECONDS})
q = extract_features(big, cfg, {CUTOFFS!r})
q.count()  # warm: plan + scan caches + python workers
best = 1e18
best_cpu = 0.0
for _ in range(2):  # best-of-2 in-session; see interleaving in main()
    c0 = cpu_tree_seconds()
    t0 = time.time()
    q.count()
    sec = time.time() - t0
    cpu = cpu_tree_seconds() - c0
    if sec < best:
        best, best_cpu = sec, cpu
print(json.dumps({{"sec": best, "cpu_sec": best_cpu, "turns": n_turns}}))
spark.stop()
"""
    # Pin the process tree to exactly `cores` CPUs: an unpinned local[8]
    # run on a 32-core box monopolizes all 32 cores' memory bandwidth and
    # cache, inflating per-core throughput in a way no real 8-core executor
    # gets — pinning makes the two levels' per-core resources comparable,
    # which is what the N -> 4N cluster-size criterion models.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    return d["sec"], d["turns"] / d["sec"], d["cpu_sec"]


def _cpu_probe() -> float:
    """Fixed single-threaded np.sort probe (seconds) — calibrates which
    hypervisor window this run landed in. BASELINE.md records the fast-
    window value; ~2x that means the 2x-bimodal slow mode and round-over-
    round comparisons of absolute seconds are noise, not regressions."""
    import numpy as np

    # np.sort is single-threaded regardless of BLAS threadpool config, so
    # the probe measures the core's speed, not the library's parallelism.
    # One un-timed pass first: a cold process reads 3-7x slower on its
    # first iterations (frequency ramp + first-touch faults) even in the
    # fast hypervisor window, which made the flag a false positive when
    # the probe ran at process start (measured 2026-08-17: cold-process
    # 0.7-2.7 s vs 0.25 s steady-state in the same window).
    a = np.random.default_rng(0).standard_normal(2_000_000)
    np.sort(a)
    t0 = time.time()
    for _ in range(8):
        np.sort(a)
    return round(time.time() - t0, 3)


# fast-window reference for the probe on this host (measured 2026-08-17 on an
# idle box right after a green full-mirror run,
# BASELINE.md §host-bimodality); slow mode reads ~2x this
CPU_PROBE_FAST_SEC = 0.23


def main():
    from z_rad_spark.session import get_spark

    probe_start = _cpu_probe()
    spark = get_spark("bench", cores=CPUS)
    import __spark_entry__ as entrymod

    n_turns = entrymod._t(spark, SF_DIR).count()

    # untimed session warm-up: run the flagship action once so JVM/codegen
    # warm-up, parquet footer reads, and executor-thread spin-up don't land
    # on whichever query happens to run first in pass 1 (BENCH_r04 charged
    # ~5 s of session cold-start to q_extract_full purely by sweep position)
    entrymod.q_extract_full(spark, SF_DIR).count()

    timings = _run_queries(spark, SF_DIR)
    # sum of per-query minima == one clean sweep (comparable to BENCH_r01's
    # single-sweep total); raw per-pass totals ride along in the JSON
    total = round(sum(v for k, v in timings.items() if not k.startswith("_")), 3)

    # flagship throughput: best warm observation (the dedicated re-run and
    # the two sweep samples all execute the identical plan; min is the
    # noise-robust estimate of its cost on this host)
    q = entrymod.q_extract_full(spark, SF_DIR)
    t0 = time.time()
    q.count()
    flagship_sec = min(time.time() - t0, timings["q_extract_full"])
    spark.stop()

    result = {
        "metric": "turns/sec end-to-end feature-vector throughput (flagship q_extract_full)",
        "value": round(n_turns / flagship_sec, 1),
        "unit": "turns/sec",
        "queries": {k: v for k, v in timings.items() if not k.startswith("_")},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_turns": n_turns,
        "flagship_sec": round(flagship_sec, 3),
        "total_sec": total,
        "query_passes": 2,
        "pass_totals_sec": timings["_pass_totals"],
        "cpus": int(CPUS),
    }
    probe_end = _cpu_probe()
    pt = timings["_pass_totals"]
    result["host_window"] = {
        # which hypervisor window this run landed in (VERDICT r2 #9):
        # slow_mode=true means absolute seconds are ~2x inflated and only
        # same-run relative comparisons are meaningful
        "cpu_probe_sec": [probe_start, probe_end],
        "cpu_probe_fast_ref": CPU_PROBE_FAST_SEC,
        # start probe only: the end probe runs right after spark.stop()
        # (JVM teardown GC) and a mid-run window flip would otherwise
        # mask a half-poisoned run; pass_total_ratio tells the rest
        "slow_mode": probe_start > 1.5 * CPU_PROBE_FAST_SEC,
        "pass_total_ratio": round(max(pt) / min(pt), 3) if min(pt) else None,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # Adjacent-pair protocol (r5): the hypervisor window drifts at
        # minutes scale by up to +/-40% — measured 2026-08-19, an 8-core
        # leg taken minutes after a 32-core leg showed HIGHER total
        # task-seconds for identical work, and best-of-each across
        # windows produced efficiency "1.03". Per-ROUND ratios of
        # back-to-back legs confine the drift to within one pair; the
        # MEDIAN over rounds is the estimator (best-of-each kept for
        # continuity with r1-r4 numbers). All per-round samples ride
        # along so the spread is visible rather than laundered.
        rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
        samples: list[dict] = []
        best: dict[int, tuple[float, float, float]] = {}
        for _ in range(rounds):
            pair: dict[int, tuple[float, float, float]] = {}
            for c in (8, 32):
                sec, thr, cpu = _flagship_throughput(c, SF_DIR)
                pair[c] = (sec, thr, cpu)
                if c not in best or sec < best[c][0]:
                    best[c] = (sec, thr, cpu)
            (s8, t8, c8), (s32, t32, c32) = pair[8], pair[32]
            samples.append({
                "sec": [round(s8, 2), round(s32, 2)],
                "cpu_sec": [round(c8, 1), round(c32, 1)],
                "eff_wall": round((t32 / t8) / 4, 3),
                "cpu_work_ratio": round(c32 / c8, 3) if c8 else None,
            })
        effs = sorted(s["eff_wall"] for s in samples)
        med_eff = effs[len(effs) // 2] if len(effs) % 2 else round(
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
        )
        (sec8, thr8, cpu8), (sec32, thr32, cpu32) = best[8], best[32]
        result["scaling"] = {
            "turns_per_sec_local8": round(thr8, 1),
            "turns_per_sec_local32": round(thr32, 1),
            # primary estimator: median of per-round adjacent-pair ratios
            "efficiency_8_to_32_median": med_eff,
            "efficiency_samples": samples,
            # legacy estimator (best leg of each level across all rounds;
            # can cross hypervisor windows — read with the samples above)
            "efficiency_8_to_32": round((thr32 / thr8) / 4, 3),
            "input_replication": SCALING_REPL,
            "sec_local8": round(sec8, 3),
            "sec_local32": round(sec32, 3),
            # CPU-work evidence (process-tree utime+stime: JVM + python
            # kernel workers). cpu_work_ratio ~= 1.0 means 4x parallelism
            # adds NO extra compute — the plan itself is scale-invariant —
            # so any wall-clock efficiency below 1.0 is contention/VM
            # noise, not serialization. cpu_utilization = cpu_sec /
            # (wall * cores): how busy the granted cores actually were.
            "cpu_sec_local8": round(cpu8, 2),
            "cpu_sec_local32": round(cpu32, 2),
            "cpu_work_ratio_32_vs_8": round(cpu32 / cpu8, 3) if cpu8 else None,
            "cpu_utilization_local8": round(cpu8 / (sec8 * 8), 3),
            "cpu_utilization_local32": round(cpu32 / (sec32 * 32), 3),
        }

    if os.environ.get("SPARK_GRAFT_SCALING_DEDUP") == "1":
        # north-rule evidence for the LLM-pipeline block: same two-level
        # pinned-subprocess protocol as the flagship, interleaved.
        # SPARK_GRAFT_SCALING_DEDUP_WHICH=a,b reruns a subset (keeps a
        # single-workload re-measure from paying for the full block).
        sd: dict = {}
        which_env = os.environ.get("SPARK_GRAFT_SCALING_DEDUP_WHICH")
        workloads = (
            tuple(w for w in which_env.split(",") if w)
            if which_env
            else ("minhash_pairs", "dup_clusters", "dup_spans", "corpus_clean")
        )
        for which in workloads:
            best: dict[int, tuple[float, float, float]] = {}
            for _ in range(2):
                for c in (8, 32):
                    sec, thr, cpu = _dedup_throughput(c, SF_DIR, which)
                    if c not in best or sec < best[c][0]:
                        best[c] = (sec, thr, cpu)
            (s8, t8, c8), (s32, t32, c32) = best[8], best[32]
            sd[which] = {
                "docs_per_sec_local8": round(t8, 1),
                "docs_per_sec_local32": round(t32, 1),
                "efficiency_8_to_32": round((t32 / t8) / 4, 3),
                "sec_local8": round(s8, 3),
                "sec_local32": round(s32, 3),
                "cpu_work_ratio_32_vs_8": round(c32 / c8, 3) if c8 else None,
                "cpu_utilization_local8": round(c8 / (s8 * 8), 3),
                "cpu_utilization_local32": round(c32 / (s32 * 32), 3),
                "input_replication": DEDUP_SCALING_REPL,
            }
        result["scaling_dedup"] = sd

    print(json.dumps(result))


if __name__ == "__main__":
    main()
