"""Optimization-round profiling harness (bench.py stays frozen).

For each named query this measures, in one warm session:
  build_s    - queries()[name](spark, sf_dir) wall time (driver-side DF
               construction: literal folding, collects inside builders)
  explain_s  - df.explain cost (analysis + optimization, no execution)
  digest1_s / digest2_s - the SAME unprunable digest action bench.py
               times, run twice (first may pay codegen; second is the
               steady-state plan cost)
  noop_s     - noop sink (guide 1.4), materializes every column
  n_exchange / n_scan / joins - plan-shape counts from the formatted plan

Usage:
  python bench_extra.py q_semdedup q_conv_features ...
  python bench_extra.py --plans-dir plans/r06 --suffix _before q_semdedup
  (no args: the full bench.py HEADLINE list)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def digest(df):
    from pyspark.sql import functions as F

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
    return df.agg(*aggs).collect()[0]


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_dir = None
    suffix = ""
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--plans-dir":
            plans_dir = argv[i + 1]
        if a == "--suffix":
            suffix = argv[i + 1]
    if plans_dir:
        args = [a for a in args if a not in (plans_dir, suffix)]

    from z_rad_spark.session import get_spark
    import bench
    import __spark_entry__ as entrymod

    names = args or bench.HEADLINE
    spark = get_spark("bench_extra", cores=CPUS)
    qs = entrymod.queries()
    # session warm-up (same as bench.py)
    entrymod.q_extract_full(spark, SF_DIR).count()

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        build_s = time.time() - t0

        t0 = time.time()
        plan = formatted_plan(df)
        explain_s = time.time() - t0

        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)

        t0 = time.time()
        digest(df)
        digest1_s = time.time() - t0
        # rebuild to include any builder-side collects in steady state? No:
        # bench.py rebuilds the DF each pass, so time build+digest together
        t0 = time.time()
        df2 = qs[name](spark, SF_DIR)
        digest(df2)
        digest2_s = time.time() - t0

        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        noop_s = time.time() - t0

        results[name] = {
            "build_s": round(build_s, 3),
            "explain_s": round(explain_s, 3),
            "digest1_s": round(digest1_s, 3),
            "build_digest2_s": round(digest2_s, 3),
            "noop_s": round(noop_s, 3),
            "n_exchange": plan.count("Exchange"),
            "n_scan": len(re.findall(r"Scan parquet|Scan ExistingRDD", plan)),
            "n_window": plan.count("Window"),
            "joins": sorted(set(re.findall(r"(\w*Join\w*)", plan))),
            "python": sorted(set(re.findall(
                r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow)", plan))),
        }
        print(name, json.dumps(results[name]), flush=True)
        spark.sparkContext.setJobDescription(None)

    print("TOTALS", json.dumps({
        k: round(sum(r[k] for r in results.values()), 2)
        for k in ("build_s", "explain_s", "digest1_s", "build_digest2_s", "noop_s")
    }))
    spark.stop()


if __name__ == "__main__":
    main()
