"""SparkSession factory tuned for the transcript feature engine.

Local testing runs on ``local[N]``; the same configuration names apply
unchanged on a multi-executor cluster (spark-submit --py-files). The
defaults below are the scale-relevant knobs:

* AQE on (runtime coalescing + skew-join splitting),
* Arrow on (all kernels are pandas/Arrow vectorized),
* shuffle partitions sized to the parallelism level instead of the 200
  default (at cluster scale this is set to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "z_rad_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    n_cores = int(os.cpu_count() or 32) if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n_cores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(n_cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        # The generated-class cache defaults to 100 entries; a session that
        # executes many distinct wide plans (this engine's 400+ query
        # registry; any long-lived analytics service) evicts everything
        # between repeats, so every re-run pays janino recompilation AND
        # a cold C2 JIT warm-up per codegen stage — measured 2-4x on the
        # window-chain queries when a 57-query sweep is repeated. Keep the
        # compiled classes warm; metaspace cost is a few hundred MB.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # Wide feature plans (18-stat algebra, 25-feature texture reducers)
        # generate methods past HotSpot's 8000-bytecode compile limit; by
        # default those run INTERPRETED forever — thread dumps showed whole
        # queries burning 10-50x CPU in interpreted codegen after enough
        # distinct plans ran in one session. Compile huge methods and give
        # the JIT room; same flags go to executors on a real cluster.
        # 1g code cache (r6): a long sweep of hundreds of distinct wide
        # plans fills 512m and the JIT then flushes hot compiled methods —
        # queries late in a sweep measured ~2x their fresh-session cost.
        .config("spark.driver.extraJavaOptions",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=2g")
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=2g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
