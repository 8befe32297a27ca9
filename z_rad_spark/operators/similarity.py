"""Similarity search over embedding columns (array<float>).

* cosine_topk      — brute-force exact top-k: broadcast the (small) query
                     set, JVM-side dot products via zip_with/aggregate,
                     per-query window top-k. The exact baseline.
* lsh_bucket_topk  — random-hyperplane LSH scale path: probe only vectors
                     sharing the query's sign-bucket (and optionally
                     neighbouring buckets). Hyperplanes are derived
                     deterministically from a seed so plans are stable
                     across runs/executors.

At 100 TB the brute-force path is a full scan per query batch — correct
but O(N); the LSH path prunes the scan to matching buckets, which is an
Exchange on a low-cardinality bucket key followed by a local top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    sim = _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    return df.withColumn(out, sim.cast("double"))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries is broadcast (small dim side); ties broken by vec_id for
    determinism. Output: (query_id, vec_id, cosine, rank).
    """
    joined = vectors.crossJoin(F.broadcast(queries))
    sim = _dot(F.col(vec_col), F.col(query_vec)) / (
        _norm(F.col(vec_col)) * _norm(F.col(query_vec))
    )
    scored = joined.select(
        F.col(query_id), F.col(id_col), sim.cast("double").alias("cosine")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 17) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def with_lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, seed: int = 17, out: str = "bucket"
) -> DataFrame:
    """Sign-pattern bucket id from deterministic random hyperplanes.

    Hyperplanes are literal arrays folded into the plan (constant-folded by
    Catalyst); each bit is sign(dot(v, plane)).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + bit * (2**i)
    return df.withColumn(out, bucket)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize vectors to their
    nearest centroid, probe only the query's ``n_probe`` nearest cells.

    ``centroids`` (cent_id, cent_vec) overrides the hash-sampled codebook
    — pass ``kmeans_lloyd`` output joined back to vectors (or any trained
    codebook) for recall above the hash-seeded default; the plan shape is
    identical either way.

    Centroids are a deterministic HASH sample of the corpus: the
    ``n_centroids`` vectors with the smallest md5("ivf|" + id) — invariant
    to data order and partitioning (unlike a head-by-id placeholder, whose
    recall silently depends on row order), and computed as a distributed
    top-K (TakeOrderedAndProject: map-side partial top-K, no full sort).
    A trained k-means codebook slots into the same plan shape: the
    codebook is broadcast, assignment is one window pass, probing is an
    equi-join on the low-cardinality cell id, so one bounded Exchange
    replaces the brute-force full cross join. Recall < 1 by construction;
    cosine_topk is the exact baseline.
    """
    if centroids is None:
        centroids = (
            vectors.select(
                F.col(id_col).alias("cent_id"),
                F.col(vec_col).alias("cent_vec"),
                F.md5(F.concat(F.lit("ivf|"), F.col(id_col).cast("string"))).alias("_h"),
            )
            .orderBy("_h")
            .limit(n_centroids)
            .drop("_h")
        )
    # the codebook is consumed by TWO broadcasts (assignment + probe);
    # persist so the distributed top-K / training job runs once
    cents = centroids.persist()
    sim_vc = _dot(F.col(vec_col), F.col("cent_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("cent_vec"))
    )
    w_assign = Window.partitionBy(id_col).orderBy(F.col("_cs").desc(), F.col("cent_id").asc())
    assigned = (
        vectors.crossJoin(F.broadcast(cents))
        .withColumn("_cs", sim_vc.cast("double"))
        .withColumn("_rn", F.row_number().over(w_assign))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, "cent_id")
    )
    sim_qc = _dot(F.col(query_vec), F.col("cent_vec")) / (
        _norm(F.col(query_vec)) * _norm(F.col("cent_vec"))
    )
    w_probe = Window.partitionBy(query_id).orderBy(F.col("_cs").desc(), F.col("cent_id").asc())
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("_cs", sim_qc.cast("double"))
        .withColumn("_rn", F.row_number().over(w_probe))
        .where(F.col("_rn") <= n_probe)
        .select(query_id, query_vec, "cent_id")
    )
    joined = assigned.join(F.broadcast(probes), "cent_id")
    sim = _dot(F.col(vec_col), F.col(query_vec)) / (
        _norm(F.col(vec_col)) * _norm(F.col(query_vec))
    )
    scored = joined.select(F.col(query_id), F.col(id_col), sim.cast("double").alias("cosine"))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    exact: bool = False,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine — the semantic-dedup mode
    (exact/minhash/simhash cover surface text; this catches paraphrases).

    ``exact=True``: all unordered pairs (id_a < id_b) scored — O(N^2),
    the oracle-verifiable baseline for small corpora and recall tests.

    ``exact=False`` (the 100 TB path): multi-table random-hyperplane LSH —
    vectors colliding in ANY of ``n_tables`` sign-buckets become
    candidates (union of T bucket equi-self-joins, never all-pairs), then
    the exact cosine filter keeps pairs >= threshold. Per-table collision
    probability for angle theta is (1 - theta/pi)^n_planes; recall is
    1 - (1 - p)^n_tables, tuned by (n_planes, n_tables).

    Output: (id_a, id_b, cosine) with id_a < id_b.
    """
    ida, idb = F.col(id_col + "_a"), F.col(id_col + "_b")
    if exact:
        a = vectors.select(F.col(id_col).alias(id_col + "_a"), F.col(vec_col).alias("_va"))
        b = vectors.select(F.col(id_col).alias(id_col + "_b"), F.col(vec_col).alias("_vb"))
        cand = a.crossJoin(b).where(ida < idb)
    else:
        parts = []
        for t in range(n_tables):
            v = with_lsh_bucket(vectors, vec_col, dim, n_planes, seed=17 + t)
            a = v.select(F.col(id_col).alias(id_col + "_a"), F.col(vec_col).alias("_va"), "bucket")
            b = v.select(F.col(id_col).alias(id_col + "_b"), F.col(vec_col).alias("_vb"), "bucket")
            parts.append(a.join(b, "bucket").where(ida < idb).drop("bucket"))
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
        cand = cand.dropDuplicates([id_col + "_a", id_col + "_b"])
    sim = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    return (
        cand.withColumn("cosine", sim.cast("double"))
        .where(F.col("cosine") >= threshold)
        .select(id_col + "_a", id_col + "_b", F.round("cosine", 6).alias("cosine"))
    )


def lsh_bucket_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall < 1 by construction (bucket boundary misses); the exact
    brute-force path is the correctness baseline for recall measurement.
    """
    v = with_lsh_bucket(vectors, vec_col, dim, n_planes)
    q = with_lsh_bucket(queries, query_vec, dim, n_planes)
    joined = v.join(F.broadcast(q), "bucket")
    sim = _dot(F.col(vec_col), F.col(query_vec)) / (
        _norm(F.col(vec_col)) * _norm(F.col(query_vec))
    )
    scored = joined.select(F.col(query_id), F.col(id_col), sim.cast("double").alias("cosine"))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 6).alias("cosine"), "rank")
    )



def _seed_centroids(vectors, k, id_col="vec_id", vec_col="embedding"):
    """Deterministic hash-sampled seed codebook shared by kmeans_assign
    and kmeans_lloyd: the k vectors with the smallest md5("km|" + id)."""
    return (
        vectors.select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
            F.md5(F.concat(F.lit("km|"), F.col(id_col).cast("string"))).alias("_h"),
        )
        .orderBy("_h")
        .limit(k)
    )


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """One k-means assignment step over the corpus: each vector labelled
    with its highest-cosine centroid (spherical k-means; ties broken by
    centroid id). With no ``centroids`` frame, seeds are the k vectors
    with the smallest md5("km|" + id) — the same data-order-invariant
    hash sample as ivf_topk's codebook, so the step is deterministic end
    to end and engine-portable (DuckDB replays it bit-for-bit).

    Plan shape: broadcast the k-row codebook, one narrow pass over the
    corpus computing k fixed-order dot products per row, argmin via a
    max_by-style window on (cosine desc, cent_id asc). One Exchange only
    if the caller aggregates afterwards — assignment itself is
    shuffle-free, which is what lets Lloyd iterations scale linearly.

    Output: (vec_id, cluster_id, cosine) — cosine to the winning centroid,
    rounded to 6dp like every float the engine emits.
    """
    if centroids is None:
        centroids = _seed_centroids(vectors, k, id_col, vec_col).drop("_h")
    sim = _dot(F.col(vec_col), F.col("cent_vec")) / (
        _norm(F.col(vec_col)) * _norm(F.col("cent_vec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cs").desc(), F.col("cent_id").asc())
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("_cs", sim.cast("double"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("cent_id").alias("cluster_id"),
            F.round("_cs", 6).alias("cosine"),
        )
    )


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means with ``iters`` Lloyd updates. Each update is a
    distributed posexplode + groupBy(cluster, dim) mean — one bounded
    shuffle on a (k x dim)-cardinality key — after which the tiny k x dim
    centroid table is collected to the driver and re-broadcast as plan
    literals for the next assignment (the standard Spark k-means shape:
    per-iteration driver traffic is O(k*dim), independent of corpus size).
    Means over float rows are NOT cross-engine bit-stable, so this path is
    pytest-verified (inertia monotonicity, determinism across runs at
    fixed partitioning) rather than oracle-hashed; kmeans_assign is the
    hash-exact single step.
    """
    assigned = kmeans_assign(vectors, k=k, id_col=id_col, vec_col=vec_col)
    # previous centroids by id: clusters that lose every member keep their
    # old centroid instead of silently shrinking k mid-iteration
    prev = {
        int(r["cent_id"]): [float(x) for x in r["cent_vec"]]
        for r in _seed_centroids(vectors, k, id_col, vec_col).collect()
    }
    for _ in range(iters):
        new_cents = (
            vectors.join(assigned.select(id_col, "cluster_id"), id_col)
            .select("cluster_id", F.posexplode(F.col(vec_col)).alias("dim", "x"))
            .groupBy("cluster_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                F.col("cluster_id").alias("cent_id"),
                F.transform("dm", lambda s: s["m"]).alias("cent_vec"),
            )
        )
        cur = {
            int(r["cent_id"]): [float(x) for x in r["cent_vec"]]
            for r in new_cents.collect()
        }
        prev = {cid: cur.get(cid, vec) for cid, vec in prev.items()}
        lit_cents = vectors.sparkSession.createDataFrame(
            sorted(prev.items()), "cent_id long, cent_vec array<double>"
        )
        assigned = kmeans_assign(
            vectors, k=k, id_col=id_col, vec_col=vec_col, centroids=lit_cents
        )
    return assigned
