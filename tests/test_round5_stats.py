"""Hand-computed fixtures for the round-5 session-3 additions:
Kruskal-Wallis H, Brown-Forsythe W, and the Wald-Wolfowitz runs test."""

import datetime as dt

import pytest

from z_rad_spark.operators.drift import brown_forsythe, kruskal_wallis
from z_rad_spark.operators.profile import runs_test


def _turns(spark, signals):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("c1", i, t0 + dt.timedelta(minutes=i), float(s))
        for i, s in enumerate(signals)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, signal double"
    )


def test_kruskal_hand_computed(spark):
    # a=[1,2], b=[2,3]: midranks 1 -> 1, 2 -> 2.5, 3 -> 4
    # R_a = 3.5, R_b = 6.5, N = 4
    # H = 12/(4*5) * (3.5^2/2 + 6.5^2/2) - 3*5 = 1.35
    # ties: one block t=2 -> C = 1 - 6/60 = 0.9 -> H_c = 1.5
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)],
        "event_type string, value double",
    )
    r = kruskal_wallis(df).collect()[0]
    assert (r["n"], r["k"], r["df"]) == (4, 2, 1)
    assert r["h"] == pytest.approx(1.35, abs=1e-12)
    assert r["h_corr"] == pytest.approx(1.5, abs=1e-12)


def test_kruskal_all_tied_is_null(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("b", 5.0)], "event_type string, value double"
    )
    r = kruskal_wallis(df).collect()[0]
    # every value ties -> C = 0 -> corrected stat undefined
    assert r["h_corr"] is None


def test_brown_forsythe_hand_computed(spark):
    # a=[1,3] (med 2, z=[1,1]), b=[2,6,10] (med 6, z=[4,0,4])
    # zbar_a=1, zbar_b=8/3, zbar=2
    # ssb = 2*(1-2)^2 + 3*(8/3-2)^2 = 10/3
    # ssw = 0 + (32 - 64/3) = 32/3
    # W = (5-2)/(2-1) * (10/3)/(32/3) = 0.9375
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 2), ("b", 6), ("b", 10)],
        "source string, n_chars long",
    )
    r = brown_forsythe(df).collect()[0]
    assert (r["n"], r["k"], r["df1"], r["df2"]) == (5, 2, 1, 3)
    assert r["w_stat"] == pytest.approx(0.9375, abs=1e-12)


def test_brown_forsythe_single_group_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5)], "source string, n_chars long"
    )
    r = brown_forsythe(df).collect()[0]
    assert r["k"] == 1 and r["w_stat"] is None


def test_runs_test_hand_computed(spark):
    # signal [1,5,1,5,5,3]; sorted [1,1,3,5,5,5] -> median 4
    # signs [-1,1,-1,1,1,-1]: n1=3, n2=3, 4 sign changes -> R=5
    # mu = 2*9/6+1 = 4; var = 18*(18-6)/(36*5) = 1.2
    # z = (5-4)/sqrt(1.2)
    out = runs_test(_turns(spark, [1, 5, 1, 5, 5, 3])).collect()[0]
    assert (out["n_above"], out["n_below"], out["n_runs"]) == (3, 3, 5)
    assert out["z"] == pytest.approx(1.0 / 1.2**0.5, abs=1e-12)


def test_runs_test_ties_dropped(spark):
    # [2, 2, 2]: every turn ties the median -> empty sign list
    out = runs_test(_turns(spark, [2, 2, 2])).collect()[0]
    assert (out["n_above"], out["n_below"], out["n_runs"]) == (0, 0, 0)
    assert out["z"] is None


def test_runs_test_one_sided_is_null(spark):
    # [1, 9]: median 5, one above one below -> runs defined (2) but a
    # single-run-per-side z is fine; [1, 1, 9] median 1 -> below empty
    out = runs_test(_turns(spark, [1, 1, 9])).collect()[0]
    assert out["n_below"] == 0 and out["z"] is None


def test_average_precision_hand_computed(spark):
    from z_rad_spark.operators.drift import average_precision

    # levels desc: 5 -> (1/2)*(1/1); 4 (tied pair, 1 pos) -> (1/2)*(2/3);
    # 2 -> 0 positives contributes nothing. AP = 1/2 + 1/3 = 5/6.
    df = spark.createDataFrame(
        [("a", 5, 1), ("a", 4, 0), ("a", 4, 1), ("a", 2, 0)],
        "source string, n_chars long, label int",
    )
    r = average_precision(df, "n_chars", "label").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["ap"] == pytest.approx(5.0 / 6.0, abs=1e-12)


def test_average_precision_no_positives_is_null(spark):
    from z_rad_spark.operators.drift import average_precision

    df = spark.createDataFrame(
        [("a", 5, 0), ("a", 4, 0)], "source string, n_chars long, label int"
    )
    r = average_precision(df, "n_chars", "label").collect()[0]
    assert r["n_pos"] == 0 and r["ap"] is None


def test_cramers_v_perfect_and_independent(spark):
    from pyspark.sql import functions as F

    from z_rad_spark.operators.drift import cramers_v

    perfect = spark.createDataFrame(
        [("a", "x")] * 2 + [("b", "y")] * 2, "r string, c string"
    )
    r = cramers_v(perfect, F.col("r"), F.col("c")).collect()[0]
    assert (r["n"], r["n_rows"], r["n_cols"], r["df"]) == (4, 2, 2, 1)
    assert r["chi2"] == pytest.approx(4.0, abs=1e-12)
    assert r["v"] == pytest.approx(1.0, abs=1e-12)

    indep = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")], "r string, c string"
    )
    r = cramers_v(indep, F.col("r"), F.col("c")).collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-12)
    assert r["v"] == pytest.approx(0.0, abs=1e-12)


def test_cramers_v_constant_dim_is_null(spark):
    from pyspark.sql import functions as F

    from z_rad_spark.operators.drift import cramers_v

    df = spark.createDataFrame([("a", "x"), ("a", "y")], "r string, c string")
    r = cramers_v(df, F.col("r"), F.col("c")).collect()[0]
    assert r["n_rows"] == 1 and r["v"] is None


def test_burstiness_hand_computed(spark):
    from z_rad_spark.operators.profile import burstiness

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("g", 1, t0),
        ("g", 2, t0 + dt.timedelta(seconds=1)),
        ("g", 3, t0 + dt.timedelta(hours=2)),
    ]
    df = spark.createDataFrame(rows, "event_type string, event_id long, ts timestamp")
    r = burstiness(df).collect()[0]
    # hours: bucket0 holds 2 events, bucket2 holds 1 -> n=3, B=2, scc=5
    assert (r["n_events"], r["n_hours"], r["n_gaps"]) == (3, 2, 2)
    mean_c, var_c = 3.0 / 2.0, 5.0 / 2.0 - (3.0 / 2.0) * (3.0 / 2.0)
    assert r["fano"] == pytest.approx(var_c / mean_c, abs=1e-12)
    # gaps (micros): 1e6 and 7199e6
    sg, sgg, m = 7200e6, 1e12 + 7199.0e6**2, 2.0
    mean_g = sg / m
    var_g = sgg / m - mean_g * mean_g
    cv = var_g**0.5 / mean_g
    assert r["cv_gap"] == pytest.approx(cv, rel=1e-12)
    assert r["burstiness"] == pytest.approx((cv - 1.0) / (cv + 1.0), rel=1e-12)


def test_burstiness_single_event_no_gaps(spark):
    from z_rad_spark.operators.profile import burstiness

    df = spark.createDataFrame(
        [("g", 1, dt.datetime(2024, 1, 1))], "event_type string, event_id long, ts timestamp"
    )
    r = burstiness(df).collect()[0]
    assert (r["n_gaps"], r["cv_gap"], r["burstiness"]) == (0, None, None)
    assert r["fano"] == pytest.approx(0.0, abs=1e-12)


def _hll_py(keys, m=256, w=23):
    import math

    P = 2147483647
    regs = {}
    for k in keys:
        x = ((abs(k) % P) * 48271 + 12345) % P
        y = (x * x + x) % P
        h = (y * 48271) % P
        b, rest = h % m, h // m
        r = (w + 1) if rest == 0 else next(
            i for i in range(1, w + 1) if rest >= 1 << (w - i)
        )
        regs[b] = max(regs.get(b, 0), r)
    v = m - len(regs)
    z = sum(2.0 ** -r for r in sorted(regs)) + float(v)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e_raw = alpha * m * m / z
    if e_raw <= 2.5 * m and v > 0:
        import math as _m

        return len(regs), v, m * _m.log(m / float(v))
    return len(regs), v, e_raw


def test_hll_matches_replay(spark):
    from z_rad_spark.operators.sketches import hyperloglog_by

    keys = list(range(1, 101))
    df = spark.createDataFrame(
        [("a", k) for k in keys], "event_type string, user_id long"
    )
    r = hyperloglog_by(df).collect()[0]
    occ, v, est = _hll_py(keys)
    assert (r["exact_distinct"], r["occupied"], r["v_zero"]) == (100, occ, v)
    assert r["est_distinct"] == pytest.approx(est, rel=1e-12)


def test_hll_small_range_uses_linear_counting(spark):
    import math

    from z_rad_spark.operators.sketches import hyperloglog_by

    keys = [3, 17, 99]
    df = spark.createDataFrame(
        [("a", k) for k in keys], "event_type string, user_id long"
    )
    r = hyperloglog_by(df).collect()[0]
    occ, v, est = _hll_py(keys)
    assert v > 0 and est == pytest.approx(256.0 * math.log(256.0 / v), rel=1e-12)
    assert r["est_distinct"] == pytest.approx(est, rel=1e-12)


def test_chao1_hand_computed(spark):
    from z_rad_spark.operators.text import chao1_richness

    df = spark.createDataFrame(
        [("s", "a b a c")], "source string, text string"
    )
    r = chao1_richness(df).collect()[0]
    # counts a:2 b:1 c:1 -> D=3 N=4 f1=2 f2=1
    assert (r["n_tokens"], r["n_vocab"], r["f1"], r["f2"]) == (4, 3, 2, 1)
    assert r["chao1"] == pytest.approx(3.0 + 2.0 * 1.0 / (2.0 * 2.0), abs=1e-12)
    assert r["gt_unseen"] == pytest.approx(0.5, abs=1e-12)
    assert r["coverage"] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_hand_replayed(spark):
    from z_rad_spark.operators.graph import pagerank_bipartite

    # bipartite: u1-{x}, u2-{x,y}; exact float replica of 2 iterations
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (2, "y"), (2, "y")],  # dup pair collapses
        "user_id long, event_type string",
    )
    got = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_bipartite(df, n_iter=2, top_k=10).collect()
    }
    edges = [("u:1", "t:x"), ("u:2", "t:x"), ("u:2", "t:y")]
    edges = edges + [(b, a) for a, b in edges]
    nodes = sorted({a for a, _ in edges})
    deg = {n: sum(1 for a, _ in edges if a == n) for n in nodes}
    nd = float(len(nodes))
    pr = {n: 1.0 / nd for n in nodes}
    for _ in range(2):
        sh = {n: pr[n] / float(deg[n]) for n in nodes}
        new = {}
        for n in nodes:
            acc = 0.0
            for a, b in sorted(edges):  # src-ordered fold
                if b == n:
                    acc = acc + sh[a]
            new[n] = (1.0 - 0.85) / nd + 0.85 * acc
        pr = new
    for n in nodes:
        assert got[n] == pytest.approx(pr[n] * nd, rel=1e-15), n
    # ranks sum to N (scaled) within float tolerance
    assert sum(got.values()) == pytest.approx(nd, rel=1e-12)


def test_pagerank_symmetric_users_tie(spark):
    from z_rad_spark.operators.graph import pagerank_bipartite

    # two structurally identical users must get exactly equal ranks and
    # the deterministic node tie-break
    df = spark.createDataFrame(
        [(1, "x"), (2, "x")], "user_id long, event_type string"
    )
    rows = pagerank_bipartite(df, n_iter=3, top_k=3).collect()
    assert [r["node"] for r in rows] == ["t:x", "u:1", "u:2"]
    assert rows[1]["pr_scaled"] == rows[2]["pr_scaled"]


def _ad_py(ref, cur):
    # pure-python replica of the Scholz-Stephens k=2 midrank statistic
    pooled = sorted(ref + cur)
    vals = sorted(set(pooled))
    n1, n2 = float(len(ref)), float(len(cur))
    N = n1 + n2
    inner = []
    for arr, na in [(ref, n1), (cur, n2)]:
        s, lb = 0.0, 0.0
        for v in vals:
            lj = float(pooled.count(v))
            ba = float(sum(1 for x in arr if x < v)) + sum(
                1 for x in arr if x == v
            ) / 2.0
            bj = lb + lj / 2.0
            den = bj * (N - bj) - N * lj / 4.0
            if den > 0:
                s += (lj / N) * ((N * ba - na * bj) ** 2) / den
            lb += lj
        inner.append(s / na)
    return (N - 1.0) / N * (inner[0] + inner[1])


def test_ad_drift_hand_replayed(spark):
    from z_rad_spark.operators.drift import ad_drift

    ref = [1, 2, 2, 3, 5, 7, 7, 8]
    cur = [2, 3, 3, 4, 6, 9]
    t0 = dt.datetime(2024, 1, 10)
    t1 = dt.datetime(2024, 1, 20)
    rows = [("r", i, t0, float(x)) for i, x in enumerate(ref)] + [
        ("r", 100 + i, t1, float(x)) for i, x in enumerate(cur)
    ]
    df = spark.createDataFrame(
        rows, "role string, turn_idx int, ts timestamp, signal double"
    )
    out = ad_drift(df, "2024-01-15 00:00:00").collect()[0]
    assert (out["n_ref"], out["n_cur"]) == (8, 6)
    assert out["a2"] == pytest.approx(_ad_py(ref, cur), rel=1e-12)


def test_ad_drift_single_block_is_null(spark):
    from z_rad_spark.operators.drift import ad_drift

    rows = [("r", 0, dt.datetime(2024, 1, 10), 5.0), ("r", 1, dt.datetime(2024, 1, 20), 5.0)]
    df = spark.createDataFrame(
        rows, "role string, turn_idx int, ts timestamp, signal double"
    )
    out = ad_drift(df, "2024-01-15 00:00:00").collect()[0]
    assert out["n_blocks"] == 1 and out["a2"] is None


def test_f_oneway_hand_computed(spark):
    from z_rad_spark.operators.drift import f_oneway

    # groups in cents: a=[100,300] (mean 200), b=[500,700] (mean 600)
    # grand 400; ssb = 2*4e4*2 = 16e4; ssw = 2e4+2e4 = 4e4
    # F = (16e4/1)/(4e4/2) = 8
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 7.0)],
        "event_type string, value double",
    )
    r = f_oneway(df).collect()[0]
    assert (r["n"], r["k"], r["df1"], r["df2"]) == (4, 2, 1, 2)
    assert r["f_stat"] == pytest.approx(8.0, abs=1e-10)


def test_f_oneway_zero_within_variance_is_null(spark):
    from z_rad_spark.operators.drift import f_oneway

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)],
        "event_type string, value double",
    )
    assert f_oneway(df).collect()[0]["f_stat"] is None


def test_mcnemar_hand_computed(spark):
    from z_rad_spark.operators.drift import mcnemar

    t_pre, t_post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    rows = [
        (1, "purchase", t_pre),            # pre only -> b
        (2, "purchase", t_post),           # post only -> c
        (3, "purchase", t_pre), (3, "purchase", t_post),  # both
        (4, "click", t_pre),               # neither
        (5, "purchase", t_pre),            # pre only -> b
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    r = mcnemar(df, "2024-01-15 00:00:00").collect()[0]
    assert (r["n_entities"], r["n_both"], r["n_pre_only"], r["n_post_only"], r["n_neither"]) == (5, 1, 2, 1, 1)
    # chi2 = (|2-1|-1)^2 / 3 = 0
    assert r["chi2"] == pytest.approx(0.0, abs=1e-12)


def test_mcnemar_no_discordant_is_null(spark):
    from z_rad_spark.operators.drift import mcnemar

    t_pre, t_post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    rows = [(1, "purchase", t_pre), (1, "purchase", t_post), (2, "click", t_pre)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    assert mcnemar(df, "2024-01-15 00:00:00").collect()[0]["chi2"] is None


def test_triangle_stats_hand_computed(spark):
    from z_rad_spark.operators.graph import triangle_stats

    # (1,2),(2,3),(1,3) is a triangle; (3,4) a pendant.
    # degs: 1->2, 2->2, 3->3, 4->1; wedges = 1+1+3+0 = 5
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (3, 1)],  # dup (1,3) reversed collapses
        "id_a long, id_b long",
    )
    r = triangle_stats(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 4, 5, 1)
    assert r["transitivity"] == pytest.approx(3.0 / 5.0, abs=1e-12)


def test_triangle_stats_no_triangles(spark):
    from z_rad_spark.operators.graph import triangle_stats

    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    r = triangle_stats(df).collect()[0]
    assert r["n_triangles"] == 0 and r["transitivity"] == pytest.approx(0.0)


def test_jarque_bera_hand_computed(spark):
    from z_rad_spark.operators.drift import jarque_bera

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("r", i, t0, float(x)) for i, x in enumerate([1, 2, 3, 4])],
        "role string, turn_idx int, ts timestamp, signal double",
    )
    r = jarque_bera(df).collect()[0]
    n, m = 4.0, 2.5
    m2 = (1 + 4 + 9 + 16) / n - m * m
    m3 = (1 + 8 + 27 + 64) / n - 3.0 * m * ((1 + 4 + 9 + 16) / n) + 2.0 * m**3
    m4 = (1 + 16 + 81 + 256) / n - 4.0 * m * ((1 + 8 + 27 + 64) / n) + 6.0 * m * m * ((1 + 4 + 9 + 16) / n) - 3.0 * m**4
    skew, kurt = m3 / (m2 * m2 * m2) ** 0.5, m4 / (m2 * m2)
    assert r["skewness"] == pytest.approx(skew, abs=1e-12)
    assert r["kurtosis"] == pytest.approx(kurt, rel=1e-12)
    assert r["jb"] == pytest.approx(n / 6.0 * (skew**2 + (kurt - 3.0) ** 2 / 4.0), rel=1e-12)


def test_jarque_bera_constant_is_null(spark):
    from z_rad_spark.operators.drift import jarque_bera

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("r", i, t0, 5.0) for i in range(3)],
        "role string, turn_idx int, ts timestamp, signal double",
    )
    assert jarque_bera(df).collect()[0]["jb"] is None


def test_lexical_concentration_hand_computed(spark):
    from z_rad_spark.operators.text import lexical_concentration

    # "a b a c" -> counts a:2 b:1 c:1; N=4, scc=6
    df = spark.createDataFrame([("s", "a b a c")], "source string, text string")
    r = lexical_concentration(df).collect()[0]
    assert (r["n_tokens"], r["n_vocab"]) == (4, 3)
    assert r["yule_k"] == pytest.approx(10000.0 * (6 - 4) / 16.0, abs=1e-12)
    assert r["simpson_d"] == pytest.approx((6 - 4) / (4.0 * 3.0), abs=1e-12)
    assert r["herfindahl"] == pytest.approx(6 / 16.0, abs=1e-12)


def test_nelson_aalen_hand_computed(spark):
    from z_rad_spark.operators.profile import nelson_aalen

    t0 = dt.datetime(2024, 1, 1)
    # conv A: tool at +60s (bucket 1, event). conv B: no tool, last turn
    # at +30s (bucket 0, censored). conv C: tool at +0s (bucket 0, event).
    rows = [
        ("A", "user", t0), ("A", "tool", t0 + dt.timedelta(seconds=60)),
        ("B", "user", t0), ("B", "user", t0 + dt.timedelta(seconds=30)),
        ("C", "tool", t0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, ts timestamp")
    out = {r["t_bucket"]: r for r in nelson_aalen(df, bucket_s=60).collect()}
    # bucket 0: n_risk 3, d=1 (C), c=1 (B) -> H=1/3, var=1/9
    # bucket 1: n_risk 1, d=1 (A) -> H=1/3+1, var=1/9+1
    import math

    assert (out[0]["n_risk"], out[0]["d"], out[0]["c"]) == (3, 1, 1)
    assert out[0]["h_na"] == pytest.approx(1.0 / 3.0, abs=1e-12)
    assert out[0]["var_h"] == pytest.approx(1.0 / 9.0, abs=1e-12)
    assert (out[1]["n_risk"], out[1]["d"]) == (1, 1)
    assert out[1]["h_na"] == pytest.approx(1.0 / 3.0 + 1.0, abs=1e-12)
    assert out[1]["s_fh"] == pytest.approx(math.exp(-(1.0 / 3.0 + 1.0)), rel=1e-12)


def test_hits_hand_replayed(spark):
    from z_rad_spark.operators.graph import hits_bipartite

    # u1-{x}, u2-{x,y}: exact float replica of 2 iterations
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (2, "y")], "user_id long, event_type string"
    )
    got = {
        (r["kind"], r["node"]): r["score"]
        for r in hits_bipartite(df, n_iter=2, top_k=5).collect()
    }
    pairs = [("1", "x"), ("2", "x"), ("2", "y")]
    h = {"1": 1.0, "2": 1.0}
    a = {}
    for _ in range(2):
        a_raw = {}
        for t in sorted({t for _, t in pairs}):
            acc = 0.0
            for u, tt in sorted(pairs):
                if tt == t:
                    acc = acc + h[u]
            a_raw[t] = acc
        nrm = 0.0
        for t in sorted(a_raw):
            nrm = nrm + a_raw[t] * a_raw[t]
        nrm = nrm**0.5
        a = {t: v / nrm for t, v in a_raw.items()}
        h_raw = {}
        for u in sorted({u for u, _ in pairs}):
            acc = 0.0
            for uu, t in sorted(pairs, key=lambda p: p[1]):
                if uu == u:
                    acc = acc + a[t]
            h_raw[u] = acc
        nrm = 0.0
        for u in sorted(h_raw):
            nrm = nrm + h_raw[u] * h_raw[u]
        nrm = nrm**0.5
        h = {u: v / nrm for u, v in h_raw.items()}
    for u, v in h.items():
        assert got[("hub", u)] == pytest.approx(v, rel=1e-15), u
    for t, v in a.items():
        assert got[("authority", t)] == pytest.approx(v, rel=1e-15), t
    # hub ordering: u2 spans both authorities -> higher hub score
    assert got[("hub", "2")] > got[("hub", "1")]


def test_label_propagation_two_triangles_bridge(spark):
    from z_rad_spark.operators.graph import label_propagation

    # two triangles {1,2,3} and {4,5,6} joined by bridge (3,4): LPA
    # keeps them as two communities labeled by their minima; CC would
    # merge them into one.
    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    r = label_propagation(df, n_iter=3).collect()[0]
    assert r["n_nodes"] == 6
    assert r["n_communities"] == 2
    assert r["max_size"] == 3
    assert r["mean_size"] == pytest.approx(3.0, abs=1e-12)


def _drift_turns(spark, ref, cur, ys=None):
    t0, t1 = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    rows = [("r", i, t0 + dt.timedelta(seconds=i), float(x)) for i, x in enumerate(ref)]
    rows += [("r", 100 + i, t1 + dt.timedelta(seconds=i), float(x)) for i, x in enumerate(cur)]
    return spark.createDataFrame(
        rows, "role string, turn_idx int, ts timestamp, signal double"
    )


def test_energy_drift_identical_is_zero(spark):
    from z_rad_spark.operators.drift import energy_drift

    df = _drift_turns(spark, [1, 2, 3, 3], [1, 2, 3, 3])
    r = energy_drift(df, "2024-01-15 00:00:00").collect()[0]
    assert r["energy"] == pytest.approx(0.0, abs=1e-12)


def test_energy_drift_hand_computed(spark):
    from z_rad_spark.operators.drift import energy_drift

    ref, cur = [1, 1, 5], [5, 9]
    df = _drift_turns(spark, ref, cur)
    r = energy_drift(df, "2024-01-15 00:00:00").collect()[0]
    exy = sum(abs(a - b) for a in ref for b in cur) / (3.0 * 2.0)
    exx = sum(abs(a - b) for a in ref for b in ref) / 9.0
    eyy = sum(abs(a - b) for a in cur for b in cur) / 4.0
    assert r["e_xy"] == pytest.approx(exy, abs=1e-12)
    assert r["energy"] == pytest.approx(2 * exy - exx - eyy, abs=1e-12)


def test_corr_drift_sign_flip(spark):
    from z_rad_spark.operators.drift import corr_drift

    # ref: signal rises with time-of-day; cur: falls -> r_ref > 0 > r_cur
    t0, t1 = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    rows = [("r", i, t0 + dt.timedelta(hours=i), float(1 + i)) for i in range(6)]
    rows += [("r", 100 + i, t1 + dt.timedelta(hours=i), float(6 - i)) for i in range(6)]
    df = spark.createDataFrame(
        rows, "role string, turn_idx int, ts timestamp, signal double"
    )
    r = corr_drift(df, "2024-01-15 00:00:00").collect()[0]
    # perfectly collinear windows: r = +/-1 exactly, z gated NULL
    assert r["r_ref"] == pytest.approx(1.0) and r["r_cur"] == pytest.approx(-1.0)
    assert r["z"] is None


def test_corr_drift_noisy_sign_flip_z(spark):
    from z_rad_spark.operators.drift import corr_drift

    t0, t1 = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 20)
    up = [1, 3, 2, 4, 5, 4, 6, 5, 7, 8]
    dn = [8, 7, 5, 6, 4, 5, 3, 4, 2, 1]
    rows = [("r", i, t0 + dt.timedelta(hours=i), float(x)) for i, x in enumerate(up)]
    rows += [("r", 100 + i, t1 + dt.timedelta(hours=i), float(x)) for i, x in enumerate(dn)]
    df = spark.createDataFrame(
        rows, "role string, turn_idx int, ts timestamp, signal double"
    )
    r = corr_drift(df, "2024-01-15 00:00:00").collect()[0]
    assert r["r_ref"] > 0.8 and r["r_cur"] < -0.8
    assert r["z"] > 2.0
