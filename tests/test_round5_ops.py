"""Hand-computed fixtures for the round-5 additions: count-min-sketch
heavy hitters, linear-counting distinct estimation, the Poisson
bootstrap CI, and cross-split near-dup contamination."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from z_rad_spark.operators.dedup import split_contamination
from z_rad_spark.operators.profile import _POIS1_CDF, poisson_bootstrap_ci
from z_rad_spark.operators.sketches import (
    _HASH_AB,
    _HASH_P,
    count_min_heavy_hitters,
    linear_count_by,
)


def _bucket_py(k: int, a: int, b: int, width: int) -> int:
    return ((a * (abs(k) % _HASH_P) + b) % _HASH_P) % width


def test_cms_exact_when_no_collisions(spark):
    # 3 distinct keys, width 512: verify in python that no two keys
    # share a bucket on EVERY hash row would be needed for an over-
    # count; with depth 4 the min over rows recovers the exact count
    # unless all 4 rows collide (they don't, checked below).
    keys = [7, 42, 99]
    counts = {7: 3, 42: 2, 99: 1}
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "user_id long")
    out = count_min_heavy_hitters(df, key_col="user_id", width=512, depth=4, top_k=10)
    got = {r["key"]: (r["est_count"], r["true_count"], r["overcount"]) for r in out.collect()}
    # no pair of keys collides on all 4 rows -> est == true
    for i, (a, b) in enumerate(_HASH_AB):
        buckets = {k: _bucket_py(k, a, b, 512) for k in keys}
        assert len(set(buckets.values())) >= 2
    assert got == {7: (3, 3, 0), 42: (2, 2, 0), 99: (1, 1, 0)}


def test_cms_overcount_on_forced_collision(spark):
    # width=1 forces EVERY key into the same bucket on every row:
    # est = total rows for every key, overcount = total - true.
    rows = [(1,), (1,), (2,)]
    df = spark.createDataFrame(rows, "user_id long")
    out = count_min_heavy_hitters(df, key_col="user_id", width=1, depth=4, top_k=10)
    got = {r["key"]: (r["est_count"], r["overcount"]) for r in out.collect()}
    assert got == {1: (3, 1), 2: (3, 2)}


def test_cms_topk_ordering(spark):
    rows = [(k,) for k in [5] * 4 + [3] * 4 + [9] * 2]
    df = spark.createDataFrame(rows, "user_id long")
    out = count_min_heavy_hitters(df, key_col="user_id", width=512, depth=4, top_k=2)
    got = [(r["key"], r["est_count"]) for r in out.collect()]
    # est desc, key asc tie-break: 3 before 5 (both 4), 9 cut by top_k
    assert got == [(3, 4), (5, 4)]


def test_linear_count_matches_formula(spark):
    keys = list(range(1, 101))
    df = spark.createDataFrame([("a", k) for k in keys], "event_type string, user_id long")
    out = linear_count_by(df, group_col="event_type", key_col="user_id", m=4096).collect()
    assert len(out) == 1
    r = out[0]
    a, b = _HASH_AB[0]
    occ = len({_bucket_py(k, a, b, 4096) for k in keys})
    assert r["exact_distinct"] == 100
    assert r["occupied"] == occ
    expected = -4096.0 * math.log((4096.0 - occ) / 4096.0)
    assert r["est_distinct"] == pytest.approx(expected, abs=1e-9)
    assert r["err_pct"] == pytest.approx((expected - 100.0) / 100.0 * 100.0, abs=1e-9)


def _pois_weight(eid: int, b: int) -> int:
    p = 2147483647
    x = (eid * 48271 + b * 69621 + 12345) % p
    u = (((x * x + x) % p) * 48271) % p / 2147483647.0
    for k, thr in enumerate(_POIS1_CDF):
        if u < float(thr):
            return k
    return len(_POIS1_CDF)


def test_bootstrap_ci_constant_value_collapses(spark):
    # every replicate mean of a constant column is that constant
    rows = [("a", i, 2.5) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    out = poisson_bootstrap_ci(df, n_boot=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 10
    assert r["mean_hat"] == 2.5
    assert r["ci_lo"] == 2.5 and r["ci_hi"] == 2.5


def test_bootstrap_ci_matches_python_replay(spark):
    rows = [("a", i, float(v)) for i, v in zip(range(1, 9), [1, 2, 3, 4, 5, 6, 7, 8])]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    out = poisson_bootstrap_ci(df, n_boot=64).collect()[0]
    means = []
    for b in range(64):
        s = nb = 0
        for i, v in zip(range(1, 9), [1, 2, 3, 4, 5, 6, 7, 8]):
            w = _pois_weight(i, b)
            s += w * int(math.floor(v * 100.0))
            nb += w
        if nb > 0:
            means.append(s / (100.0 * nb))
    means.sort()
    lo = means[int(math.floor(0.025 * 64))]
    hi = means[int(math.ceil(0.975 * 64)) - 1]
    assert out["mean_hat"] == pytest.approx(4.5, abs=1e-9)
    assert out["ci_lo"] == pytest.approx(lo, abs=1e-12)
    assert out["ci_hi"] == pytest.approx(hi, abs=1e-12)
    assert out["ci_lo"] <= out["mean_hat"] <= out["ci_hi"]


def _split_py(doc_id: int, fracs, salt="split1") -> str:
    h = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:8]
    cum = 0.0
    items = list(fracs.items())
    for name, frac in items[:-1]:
        cum += frac
        thr_int = int(cum * 16**8)
        thr = "g" * 8 if thr_int >= 16**8 else format(thr_int, "08x")
        if h < thr:
            return name
    return items[-1][0]


def test_split_contamination_filters_same_split_pairs(spark):
    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    # build pairs whose expected splits we derive in python
    ids = list(range(1, 41))
    splits = {i: _split_py(i, fracs) for i in ids}
    pairs = [(a, b) for a in ids for b in ids if a < b][:200]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = split_contamination(df, fracs)
    got = {(r["id_a"], r["id_b"]): (r["split_a"], r["split_b"]) for r in out.collect()}
    expected = {
        (a, b): (splits[a], splits[b]) for a, b in pairs if splits[a] != splits[b]
    }
    assert got == expected
    assert all(sa != sb for sa, sb in got.values())


def test_bootstrap_plan_collapses_explode_map_side(spark):
    # the scale contract: the n_boot explode must collapse in the SAME
    # stage's partial aggregation — no Exchange between the Generate and
    # the partial sum, so the shuffle carries only groups x B partials
    import re

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 50)],
        "event_type string, event_id long, value double",
    )
    plan = poisson_bootstrap_ci(df)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"\bGenerate\b", plan)) == 1
    m = re.search(r"partial_sum\(\(_w[\s\S]*?Generate", plan)
    assert m is not None, "partial aggregate must sit above the Generate"
    assert "Exchange" not in m.group(0)


def test_auc_binary_matches_sklearn_style_reference(spark):
    # hand case with ties: scores [1,2,2,3], labels [0,1,0,1]
    # pairs (pos,neg): (2a,1)=win, (2a,2b)=tie/2, (3,1)=win, (3,2b)=win
    # AUC = (1 + 0.5 + 1 + 1) / (2*2) = 0.875
    from z_rad_spark.operators.drift import auc_binary

    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (2.0, 0), (3.0, 1)], "score double, label int"
    )
    r = auc_binary(df, "score", "label").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["auc"] == pytest.approx(0.875, abs=1e-12)


def test_auc_binary_degenerate_group_is_null(spark):
    from z_rad_spark.operators.drift import auc_binary

    df = spark.createDataFrame(
        [("g1", 1.0, 1), ("g1", 2.0, 1), ("g2", 1.0, 0), ("g2", 2.0, 1)],
        "g string, score double, label int",
    )
    got = {r["g"]: r["auc"] for r in auc_binary(df, "score", "label", "g").collect()}
    assert got["g1"] is None
    assert got["g2"] == pytest.approx(1.0)


def test_lsh_recall_eval_counts(spark):
    # two exact-duplicate docs (a true near-dup pair LSH must find) and
    # one unrelated doc: truth = {(1,2)}, candidates must include (1,2)
    from z_rad_spark.operators.dedup import lsh_recall_eval

    txt = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, txt), (2, txt), (3, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    r = lsh_recall_eval(df, n=3, n_hashes=8, band_size=4, threshold=0.5).collect()[0]
    assert r["n_true"] == 1 and r["n_hit"] == 1
    assert r["recall"] == 1.0
    assert r["n_cand"] >= 1 and 0.0 < r["precision"] <= 1.0


def test_jackknife_cluster_se_hand_case(spark):
    from z_rad_spark.operators.profile import jackknife_cluster_se

    rows = [("a", 1, 1.0), ("a", 1, 3.0), ("a", 2, 5.0), ("a", 3, 7.0)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    r = jackknife_cluster_se(df).collect()[0]
    # S=1600 cents, N=4, G=3; loo means: 6.0, 11/3, 3.0
    ms = [6.0, 1100 / 300.0, 3.0]
    theta = sum(ms) / 3.0
    ss = sum((m - theta) ** 2 for m in ms)
    import math as _m

    assert (r["n"], r["n_clusters"]) == (4, 3)
    assert r["mean_hat"] == pytest.approx(4.0, abs=1e-12)
    assert r["jk_se"] == pytest.approx(_m.sqrt(2.0 / 3.0 * ss), abs=1e-9)
    assert r["ci_lo"] == pytest.approx(4.0 - 1.96 * r["jk_se"], abs=1e-9)


def test_jackknife_single_cluster_is_null(spark):
    from z_rad_spark.operators.profile import jackknife_cluster_se

    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 1, 4.0)], "event_type string, user_id long, value double"
    )
    r = jackknife_cluster_se(df).collect()[0]
    assert r["n_clusters"] == 1 and r["jk_se"] is None and r["ci_lo"] is None


def test_srm_check_counts_and_chi2(spark):
    from z_rad_spark.operators.curation import srm_check

    fracs = {"train": 0.8, "val": 0.1, "test": 0.1}
    ids = list(range(1, 201))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    r = srm_check(df, fracs).collect()[0]
    splits = [_split_py(i, fracs) for i in ids]
    n = {s: splits.count(s) for s in ("train", "val", "test")}
    assert r["n_total"] == 200
    assert (r["n_train"], r["n_val"], r["n_test"]) == (n["train"], n["val"], n["test"])
    exp = {"train": 160.0, "val": 20.0, "test": 20.0}
    chi2 = sum((n[s] - exp[s]) ** 2 / exp[s] for s in ("train", "val", "test"))
    assert r["chi2"] == pytest.approx(chi2, abs=1e-9)


def test_permutation_test_matches_python_replay(spark):
    import datetime as dt

    from z_rad_spark.operators.profile import permutation_test

    # 4 events on Sat 2024-01-06, 4 on Mon 2024-01-08
    rows = []
    vals = [10.0, 20.0, 30.0, 40.0, 11.0, 21.0, 31.0, 41.0]
    for i, v in enumerate(vals, start=1):
        day = dt.datetime(2024, 1, 6) if i <= 4 else dt.datetime(2024, 1, 8)
        rows.append(("a", i, v, day))
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double, ts timestamp")
    r = permutation_test(df, n_perm=64).collect()[0]

    cents = [int(math.floor(v * 100.0)) for v in vals]
    we = [i <= 4 for i in range(1, 9)]
    s1 = sum(c for c, w in zip(cents, we) if w)
    s0 = sum(c for c, w in zip(cents, we) if not w)
    obs = s1 / (100.0 * 4) - s0 / (100.0 * 4)

    def _u(i, b):
        p = 2147483647
        x = (i * 48271 + b * 69621 + 12345) % p
        return (((x * x + x) % p) * 48271) % p / 2147483647.0

    n_ge = n_valid = 0
    for b in range(64):
        sides = [_u(i, b) < 0.5 for i in range(1, 9)]
        if not any(sides) or all(sides):
            continue
        n_valid += 1
        d1 = sum(c for c, s in zip(cents, sides) if s)
        d0 = sum(c for c, s in zip(cents, sides) if not s)
        n1, n0 = sum(sides), 8 - sum(sides)
        diff = d1 / (100.0 * n1) - d0 / (100.0 * n0)
        if abs(diff) >= abs(obs):
            n_ge += 1
    assert r["obs_diff"] == pytest.approx(obs, abs=1e-12)
    assert (r["n_ge"], r["n_valid"]) == (n_ge, n_valid)
    assert r["p_hat"] == pytest.approx((n_ge + 1) / (n_valid + 1), abs=1e-12)
