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

HEADLINE = [
    "q_extract_full",
    "q_stats_asof",
    "q_hist_asof",
    "q_glcm",
    "q_asof_state",
    "q_sessionize",
    "q_backfill_nn",
    "q_minhash_pairs",
    "q_cosine_topk",
    "q_dedup_exact",
]


def _run_queries(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    for name in HEADLINE:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        timings.setdefault("_rows", {})[name] = n
    return timings


def _flagship_throughput(cores: int, sf_dir: str) -> tuple[float, float]:
    """(seconds, turns/sec) for the flagship point-in-time extraction on a
    fresh local[cores] session (new JVM-free: same JVM reused is wrong for
    scaling runs, so each level runs in a subprocess)."""
    import subprocess

    code = f"""
import json, time, sys
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from z_rad_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark("bench_scaling", cores={cores})
t = e._t(spark, {sf_dir!r})
n_turns = t.count()
q = e.q_extract_full(spark, {sf_dir!r})
q.count()  # warm: plan + scan caches
t0 = time.time()
q.count()
sec = time.time() - t0
print(json.dumps({{"sec": sec, "turns": n_turns}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    return d["sec"], d["turns"] / d["sec"]


def main():
    from z_rad_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS)
    import __spark_entry__ as entrymod

    n_turns = entrymod._t(spark, SF_DIR).count()

    t_all0 = time.time()
    timings = _run_queries(spark, SF_DIR)
    total = round(time.time() - t_all0, 3)

    # flagship throughput on the shared session (second run, warm)
    q = entrymod.q_extract_full(spark, SF_DIR)
    t0 = time.time()
    q.count()
    flagship_sec = time.time() - t0
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
        "cpus": int(CPUS),
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        sec8, thr8 = _flagship_throughput(8, SF_DIR)
        sec32, thr32 = _flagship_throughput(32, SF_DIR)
        result["scaling"] = {
            "turns_per_sec_local8": round(thr8, 1),
            "turns_per_sec_local32": round(thr32, 1),
            "efficiency_8_to_32": round((thr32 / thr8) / 4, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
