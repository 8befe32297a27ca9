"""Round-5 session-7 operator fixtures: hand-computed expectations for
bartlett_test, wilcoxon_signed_rank, cochran_q, icc_oneway."""

import math

import pytest

from pyspark.sql import functions as F


def _turns(spark, rows):
    # rows: (conv_id, turn_idx, role, signal); ts strictly increasing
    # per conversation so the stable (ts, turn_idx) order is turn order
    data = [
        (c, i, r, f"2024-01-01 00:{i:02d}:00", float(s) if s is not None else None)
        for (c, i, r, s) in rows
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, ts string, signal double"
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_bartlett_hand_computed(spark):
    from z_rad_spark.operators.drift import bartlett_test

    # group a: [1, 3] -> var 2; group b: [2, 2, 5] -> var 3
    rows = [
        ("c1", 0, "a", 1), ("c1", 1, "a", 3),
        ("c2", 0, "b", 2), ("c2", 1, "b", 2), ("c2", 2, "b", 5),
    ]
    r = bartlett_test(_turns(spark, rows), group_col="role").collect()[0]
    assert r["n"] == 5 and r["k"] == 2 and r["df"] == 1
    sp2 = (1 * 2.0 + 2 * 3.0) / 3.0
    assert r["sp2"] == pytest.approx(sp2, rel=1e-12)
    sum_ln = 1 * math.log(2.0) + 2 * math.log(3.0)
    c = 1.0 + (1.0 / 1 + 1.0 / 2 - 1.0 / 3) / (3.0 * 1)
    stat = (3 * math.log(sp2) - sum_ln) / c
    assert r["stat"] == pytest.approx(stat, rel=1e-12)


def test_bartlett_degenerate_zero_variance(spark):
    from z_rad_spark.operators.drift import bartlett_test

    rows = [("c1", 0, "a", 2), ("c1", 1, "a", 2), ("c2", 0, "b", 1), ("c2", 1, "b", 3)]
    r = bartlett_test(_turns(spark, rows), group_col="role").collect()[0]
    assert r["stat"] is None and r["sp2"] is None  # group a variance 0


def test_wilcoxon_hand_computed(spark):
    from z_rad_spark.operators.drift import wilcoxon_signed_rank

    # conversations engineered so the post-pre differences are
    # d = +3 (c1: pre [1], post [4]), -1 (c2: pre [2], post [1]),
    # +1 (c3: pre [3], post [4]), 0 (c4: pre [5], post [5]) -> dropped
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 4),
        ("c2", 0, "user", 2), ("c2", 1, "user", 1),
        ("c3", 0, "user", 3), ("c3", 1, "user", 4),
        ("c4", 0, "user", 5), ("c4", 1, "user", 5),
    ]
    r = wilcoxon_signed_rank(_turns(spark, rows)).collect()[0]
    # |d| ranks: |−1| and |+1| tie at midrank 1.5, |+3| rank 3
    # W+ = 1.5 + 3 = 4.5; m = 3
    assert r["n_pairs"] == 4 and r["m"] == 3
    assert r["two_w_pos"] == 9 and r["w_plus"] == pytest.approx(4.5)
    # mu = m(m+1)/4 = 3; var = 3*4*7/24 - (2^3-2)/48 = 3.5 - 0.125
    z = (4.5 - 3.0) / math.sqrt(3.375)
    assert r["z"] == pytest.approx(z, rel=1e-12)
    assert r["tie3"] == 6


def test_cochran_q_hand_computed(spark):
    from z_rad_spark.operators.drift import cochran_q

    # blocks x (user, assistant, tool) success (signal >= 5) matrix:
    # c1: (1,1,0)  c2: (1,0,0)  c3: (1,1,1)  c4: (0,0,0)
    rows = [
        ("c1", 0, "user", 7), ("c1", 1, "assistant", 6), ("c1", 2, "tool", 2),
        ("c2", 0, "user", 5), ("c2", 1, "assistant", 1),
        ("c3", 0, "user", 9), ("c3", 1, "assistant", 5), ("c3", 2, "tool", 8),
        ("c4", 0, "user", 1),
    ]
    r = cochran_q(_turns(spark, rows)).collect()[0]
    # C = (3, 2, 1), T = 6, sum R^2 = 4 + 1 + 9 + 0 = 14
    # Q = 2 * (3*14 - 36) / (18 - 14) = 12/4 = 3
    assert r["b"] == 4 and r["k"] == 3 and r["t"] == 6
    assert r["q"] == pytest.approx(3.0, abs=1e-12)


def test_cochran_q_no_disagreement_is_null(spark):
    from z_rad_spark.operators.drift import cochran_q

    rows = [("c1", 0, "user", 9), ("c1", 1, "assistant", 9), ("c1", 2, "tool", 9)]
    r = cochran_q(_turns(spark, rows)).collect()[0]
    assert r["q"] is None  # single all-1 block: denominator 0


def test_icc_hand_computed(spark):
    from z_rad_spark.operators.drift import icc_oneway

    # c1: [1, 2] (n=2, S=3), c2: [5, 7, 6] (n=3, S=18)
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 2),
        ("c2", 0, "user", 5), ("c2", 1, "user", 7), ("c2", 2, "user", 6),
    ]
    r = icc_oneway(_turns(spark, rows)).collect()[0]
    assert r["k"] == 2 and r["n"] == 5
    sum_s2n = 9.0 / 2 + 324.0 / 3
    msb = (sum_s2n - 441.0 / 5) / 1.0
    msw = (115.0 - sum_s2n) / 3.0
    n0 = (5.0 - 13.0 / 5.0) / 1.0
    icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
    assert r["msb"] == pytest.approx(msb, rel=1e-12)
    assert r["msw"] == pytest.approx(msw, rel=1e-12)
    assert r["n0"] == pytest.approx(n0, rel=1e-12)
    assert r["icc"] == pytest.approx(icc, rel=1e-12)


def test_icc_exchangeable_turns_near_zero(spark):
    from z_rad_spark.operators.drift import icc_oneway

    # identical group profiles -> between-group mean square equals 0,
    # icc = -msw / (msb + (n0-1) msw) < 0 (the estimator's known
    # negative range when groups explain nothing)
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 9),
        ("c2", 0, "user", 1), ("c2", 1, "user", 9),
    ]
    r = icc_oneway(_turns(spark, rows)).collect()[0]
    assert r["msb"] == pytest.approx(0.0, abs=1e-12)
    assert r["icc"] < 0


def test_perm_entropy_hand_computed(spark):
    from z_rad_spark.operators.profile import permutation_entropy

    # c1: 1,2,3,2 -> windows (1,2,3) code 0+0+0=0; (2,3,2) code 0+0+1=1
    rows = [("c1", 0, "user", 1), ("c1", 1, "user", 2),
            ("c1", 2, "user", 3), ("c1", 3, "user", 2)]
    r = permutation_entropy(_turns(spark, rows)).collect()[0]
    assert r["n_windows"] == 2 and r["n_patterns"] == 2
    assert r["h"] == pytest.approx(1.0, abs=1e-12)  # two equiprobable codes
    assert r["h_norm"] == pytest.approx(1.0 / math.log2(6.0), rel=1e-12)


def test_perm_entropy_monotone_is_zero(spark):
    from z_rad_spark.operators.profile import permutation_entropy

    rows = [("c1", i, "user", i + 1) for i in range(6)]
    r = permutation_entropy(_turns(spark, rows)).collect()[0]
    assert r["n_patterns"] == 1 and r["h"] == pytest.approx(0.0, abs=1e-12)


def test_turning_points_hand_computed(spark):
    from z_rad_spark.operators.profile import turning_points

    # 1,3,2,4,4: interior turns at 3 (peak) and 2 (valley); the 4,4
    # plateau is not a strict extremum -> T = 2, n = 5
    rows = [("c1", 0, "user", 1), ("c1", 1, "user", 3), ("c1", 2, "user", 2),
            ("c1", 3, "user", 4), ("c1", 4, "user", 4)]
    r = turning_points(_turns(spark, rows)).collect()[0]
    assert r["n"] == 5 and r["t_points"] == 2
    assert r["expected"] == pytest.approx(2.0, abs=1e-12)
    assert r["z"] == pytest.approx(0.0, abs=1e-12)


def test_ljung_box_alternating_strong_negative_r1(spark):
    from z_rad_spark.operators.profile import ljung_box

    # perfectly alternating 1,9,1,9,... -> r1 near -1, r2 near +1
    rows = [("c1", i, "user", 1 if i % 2 == 0 else 9) for i in range(12)]
    r = ljung_box(_turns(spark, rows), lags=5).collect()[0]
    assert r["n"] == 12
    # exact replay: r_k = (n^2 Sxy - n S (Sh+St) + (n-k) S^2) / (n (n SS - S^2))
    x = [1 if i % 2 == 0 else 9 for i in range(12)]
    n, S, SS = 12, sum(x), sum(v * v for v in x)
    for k in range(1, 6):
        sxy = sum(x[i] * x[i - k] for i in range(k, n))
        sh = sum(x[i - k] for i in range(k, n))
        st = sum(x[i] for i in range(k, n))
        rk = (n * n * sxy - n * S * (sh + st) + (n - k) * S * S) / (n * (n * SS - S * S))
        assert r[f"r{k}"] == pytest.approx(round(rk, 6), abs=2e-6), k
    assert r["r1"] < -0.8 and r["r2"] > 0.7
    q = n * (n + 2) * sum(
        ((n * n * sum(x[i] * x[i - k] for i in range(k, n))
          - n * S * (sum(x[i - k] for i in range(k, n)) + sum(x[i] for i in range(k, n)))
          + (n - k) * S * S) / (n * (n * SS - S * S))) ** 2 / (n - k)
        for k in range(1, 6))
    assert r["q_lb"] == pytest.approx(q, rel=1e-6)


def test_ljung_box_constant_is_null(spark):
    from z_rad_spark.operators.profile import ljung_box

    rows = [("c1", i, "user", 4) for i in range(10)]
    r = ljung_box(_turns(spark, rows), lags=5).collect()[0]
    assert r["q_lb"] is None and r["r1"] is None


def test_mase_period3_signal_beats_naive(spark):
    from z_rad_spark.operators.profile import seasonal_naive_mase

    # exact period-3 pattern: seasonal naive is perfect (sad_m = 0)
    pat = [1, 5, 9]
    rows = [("c1", i, "user", pat[i % 3]) for i in range(9)]
    r = seasonal_naive_mase(_turns(spark, rows), season=3).collect()[0]
    assert r["n"] == 9 and r["sad_m"] == 0
    assert r["mase"] == pytest.approx(0.0, abs=1e-12)
    # naive MAE: |5-1|+|9-5|+|1-9| repeating = (4+4+8)*...: sad_1 over 8 steps
    assert r["sad_1"] == 4 + 4 + 8 + 4 + 4 + 8 + 4 + 4
    assert r["mae_naive"] == pytest.approx(r["sad_1"] / 8.0, rel=1e-12)


def test_did_hand_computed(spark):
    from z_rad_spark.operators.drift import diff_in_diff

    # force assignment via salt-free check: build conversations and read
    # back which cell each landed in, then verify the arithmetic from
    # the cells the operator itself reports
    rows = []
    # 4 conversations x 4 turns each: 2 turns pre, 2 post
    for ci in range(4):
        for i in range(4):
            rows.append((f"c{ci}", i, "user", 1 + ci + i))
    data = [
        (c, i, r, f"2024-01-{10 + 7 * (i // 2):02d} 00:{i:02d}:00", float(s))
        for (c, i, r, s) in rows
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, ts string, signal double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = diff_in_diff(df).collect()[0]
    # cells partition all 16 turns
    assert r["n_cp"] + r["n_ct"] + r["n_tp"] + r["n_tt"] == 16
    if r["se"] is not None:
        assert r["t_stat"] == pytest.approx(r["did"] / r["se"], rel=1e-9)


def test_delta_ratio_hand_computed(spark):
    from z_rad_spark.operators.drift import delta_ratio_ci

    # c1: 2 user of 3 turns; c2: 1 user of 2 turns; c3: 0 of 1
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 1), ("c1", 2, "assistant", 1),
        ("c2", 0, "user", 1), ("c2", 1, "tool", 1),
        ("c3", 0, "assistant", 1),
    ]
    r = delta_ratio_ci(_turns(spark, rows)).collect()[0]
    assert r["m"] == 3 and r["sx"] == 3 and r["sy"] == 6
    assert r["ratio"] == pytest.approx(0.5, abs=1e-12)
    m, sx, sy = 3, 3, 6
    sxx, syy, sxy = 4 + 1 + 0, 9 + 4 + 1, 6 + 2 + 0
    var_x = (m * sxx - sx * sx) / (m * (m - 1))
    var_y = (m * syy - sy * sy) / (m * (m - 1))
    cov = (m * sxy - sx * sy) / (m * (m - 1))
    rr, ybar = 0.5, 2.0
    se = math.sqrt((var_x + rr * rr * var_y - 2 * rr * cov) / (m * ybar * ybar))
    assert r["se"] == pytest.approx(se, rel=1e-12)
    assert r["lo"] == pytest.approx(rr - 1.959963984540054 * se, rel=1e-9)
    assert r["hi"] == pytest.approx(rr + 1.959963984540054 * se, rel=1e-9)


def test_sprt_decides_h1_on_streak(spark):
    from z_rad_spark.operators.drift import sprt_bernoulli

    # 9 successes in a row: llr_t = t * ln(1.5) crosses ln(19) ~ 2.944
    # at t = ceil(2.944 / 0.4055) = 8
    rows = [("c1", i, "user", 9) for i in range(9)]
    r = sprt_bernoulli(_turns(spark, rows)).collect()[0]
    assert r["decision"] == "h1" and r["n_decision"] == 8
    assert r["k"] == 9 and r["n"] == 9
    assert r["llr_final"] == pytest.approx(9 * math.log(1.5), rel=1e-12)


def test_sprt_decides_h0_on_failures(spark):
    from z_rad_spark.operators.drift import sprt_bernoulli

    rows = [("c1", i, "user", 1) for i in range(9)]
    r = sprt_bernoulli(_turns(spark, rows)).collect()[0]
    assert r["decision"] == "h0" and r["n_decision"] == 8
    assert r["llr_final"] == pytest.approx(9 * math.log(0.4 / 0.6), rel=1e-12)


def test_sprt_alternating_continues(spark):
    from z_rad_spark.operators.drift import sprt_bernoulli

    rows = [("c1", i, "user", 9 if i % 2 == 0 else 1) for i in range(10)]
    r = sprt_bernoulli(_turns(spark, rows)).collect()[0]
    assert r["decision"] == "continue" and r["n_decision"] is None
    assert r["llr_final"] == pytest.approx(
        5 * math.log(1.5) + 5 * math.log(0.4 / 0.6), abs=1e-12
    )


def test_cindex_perfect_risk_ranking(spark):
    from z_rad_spark.operators.profile import concordance_index

    # c1: event at +60s, mean signal 9 (highest risk, earliest event)
    # c2: event at +120s, mean signal 5
    # c3: censored at +180s, mean signal 1
    def conv(cid, minutes, sig, with_tool):
        out = [(cid, 0, "user", f"2024-01-01 00:00:00", sig)]
        out.append(
            (cid, 1, "tool" if with_tool else "user",
             f"2024-01-01 00:{minutes:02d}:00", sig)
        )
        return out

    data = conv("c1", 1, 9.0, True) + conv("c2", 2, 5.0, True) + conv("c3", 3, 1.0, False)
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, ts string, signal double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = concordance_index(df).collect()[0]
    # comparable: (c1,c2), (c1,c3), (c2,c3) — all with earlier event
    assert r["n_conv"] == 3 and r["n_events"] == 2
    assert r["comparable"] == 3 and r["concordant"] == 3 and r["tied"] == 0
    assert r["c_index"] == pytest.approx(1.0, abs=1e-12)


def test_cindex_censored_first_not_comparable(spark):
    from z_rad_spark.operators.profile import concordance_index

    # only conversation with the SHORTER duration is censored -> the
    # pair is not comparable (we cannot know its true event time)
    data = [
        ("c1", 0, "user", "2024-01-01 00:00:00", 9.0),
        ("c1", 1, "user", "2024-01-01 00:01:00", 9.0),
        ("c2", 0, "user", "2024-01-01 00:00:00", 1.0),
        ("c2", 1, "tool", "2024-01-01 00:05:00", 1.0),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, ts string, signal double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = concordance_index(df).collect()[0]
    assert r["comparable"] == 0 and r["c_index"] is None


def test_good_turing_hand_computed(spark):
    from z_rad_spark.operators.text import good_turing

    # docs built so trigram counts are: "a b c d" -> trigrams "a b c",
    # "b c d"; duplicate the doc once -> both trigrams have count 2;
    # one extra doc "x y z" -> count 1
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z")],
        "doc_id long, text string",
    )
    out = {r["r"]: r for r in good_turing(docs).collect()}
    # N_1 = 1 (x y z), N_2 = 2 (the two shared trigrams); N = 5 shingles
    assert out[1]["n_r"] == 1 and out[2]["n_r"] == 2
    assert out[0]["n_r"] == 1  # unseen mass numerator = N_1
    assert out[0]["p_r"] == pytest.approx(1.0 / 5.0, abs=1e-12)
    # r*=1: (1+1)*N_2/N_1 = 4; p_1 = 4/5
    assert out[1]["r_star"] == pytest.approx(4.0, abs=1e-12)
    assert out[1]["p_r"] == pytest.approx(0.8, abs=1e-12)
    # r=2 has no N_3 -> degenerate NULL
    assert out[2]["r_star"] is None


def test_log_odds_keyness_signs(spark):
    from z_rad_spark.operators.text import log_odds_keyness

    # 'hello' dominates en, 'hallo' dominates de; both pass min_count
    docs = spark.createDataFrame(
        [(1, "en", "hello hello hello hello hello world"),
         (2, "de", "hallo hallo hallo hallo hallo welt"),
         (3, "en", "world world world"),
         (4, "de", "welt welt welt")],
        "doc_id long, lang string, text string",
    )
    out = {r["token"]: r for r in log_odds_keyness(docs, min_count=3, k=10).collect()}
    assert out["hello"]["z"] > 0 and out["hallo"]["z"] < 0
    assert out["hello"]["y_a"] == 5 and out["hello"]["y_b"] == 0
    # ranks are 1..k with |z| descending
    zs = sorted((abs(r["z"]) for r in out.values()), reverse=True)
    by_rank = [abs(r["z"]) for r in sorted(out.values(), key=lambda r: r["rank"])]
    assert by_rank == zs


def test_chi2_tokens_perfect_separator(spark):
    from z_rad_spark.operators.text import chi2_token_selection

    docs = spark.createDataFrame(
        [(i, "en", "alpha beta") for i in range(3)]
        + [(10 + i, "de", "gamma beta") for i in range(3)],
        "doc_id long, lang string, text string",
    )
    out = {r["token"]: r for r in chi2_token_selection(docs, min_df=2, k=5).collect()}
    # alpha: a=3,b=0,c=0,d=3 -> chi2 = 6*81/81 = 6 (perfect separator)
    assert out["alpha"]["chi2"] == pytest.approx(6.0, abs=1e-12)
    assert out["gamma"]["chi2"] == pytest.approx(6.0, abs=1e-12)
    # beta is in every doc: b+d margin (c+d)(a+c)... det = 3*0-3*0... a=3,b=3,c=0,d=0
    # margins c+d = 0 -> NULL guard
    assert out["beta"]["chi2"] is None


def test_local_clustering_triangle_plus_tail(spark):
    from z_rad_spark.operators.graph import local_clustering

    # triangle 1-2-3 plus tail 3-4: node 3 has degree 3, one triangle
    # -> c = 2*1/(3*2) = 1/3; nodes 1,2 have c = 1; node 4 degree 1
    # (excluded)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    out = {r["node"]: r for r in local_clustering(edges).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["clustering"] == pytest.approx(1.0)
    assert out[2]["clustering"] == pytest.approx(1.0)
    assert out[3]["degree"] == 3 and out[3]["triangles"] == 1
    assert out[3]["clustering"] == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_brier_decomposition_hand_computed(spark):
    from z_rad_spark.operators.encoding import brier_decomposition

    # probs 0.1 (y=0), 0.1 (y=1), 0.9 (y=1), 0.9 (y=1): two bins
    df = spark.createDataFrame(
        [(0.1, False), (0.1, True), (0.9, True), (0.9, True)],
        "prob double, label_true boolean",
    )
    r = brier_decomposition(df).collect()[0]
    assert r["n"] == 4 and r["n_pos"] == 3
    brier = ((0.1 - 0) ** 2 + (0.1 - 1) ** 2 + 2 * (0.9 - 1) ** 2) / 4.0
    assert r["brier"] == pytest.approx(brier, rel=1e-9)
    ybar = 0.75
    # bin 1 (p=0.1): conf 0.1, acc 0.5; bin 9 (p=0.9): conf 0.9, acc 1.0
    rel = 0.5 * (0.1 - 0.5) ** 2 + 0.5 * (0.9 - 1.0) ** 2
    res = 0.5 * (0.5 - ybar) ** 2 + 0.5 * (1.0 - ybar) ** 2
    unc = ybar * (1 - ybar)
    assert r["rel"] == pytest.approx(rel, rel=1e-9)
    assert r["res"] == pytest.approx(res, rel=1e-9)
    assert r["unc"] == pytest.approx(unc, rel=1e-9)
    assert r["brier_binned"] == pytest.approx(rel - res + unc, rel=1e-9)
    # with all mass at the bin means, the decomposition is exact here
    assert r["brier_binned"] == pytest.approx(r["brier"], abs=0.05)


def test_fleiss_kappa_perfect_agreement(spark):
    from z_rad_spark.operators.drift import fleiss_kappa

    # every panel unanimous, but on DIFFERENT categories -> kappa = 1
    rows = [("c1", i, "user", 2) for i in range(3)] + [
        ("c2", i, "user", 7) for i in range(3)
    ]
    r = fleiss_kappa(_turns(spark, rows)).collect()[0]
    assert r["m_items"] == 2
    assert r["pbar"] == pytest.approx(1.0, abs=1e-12)
    assert r["kappa"] == pytest.approx(1.0, abs=1e-12)


def test_fleiss_kappa_hand_computed(spark):
    from z_rad_spark.operators.drift import fleiss_kappa

    # item c1 votes (2,2,7): sum nic^2 = 4+1 = 5; item c2 (7,7,7): 9
    # Pbar = (14 - 6)/(2*3*2) = 8/12; C_2=2, C_7=4 -> Pe = (4+16)/36
    rows = [
        ("c1", 0, "user", 2), ("c1", 1, "user", 2), ("c1", 2, "user", 7),
        ("c2", 0, "user", 7), ("c2", 1, "user", 7), ("c2", 2, "user", 7),
        ("c3", 0, "user", 5),  # incomplete panel: dropped
    ]
    r = fleiss_kappa(_turns(spark, rows)).collect()[0]
    assert r["m_items"] == 2 and r["s"] == 14 and r["sum_c2"] == 20
    pbar, pe = 8.0 / 12.0, 20.0 / 36.0
    assert r["pbar"] == pytest.approx(pbar, rel=1e-12)
    assert r["pe"] == pytest.approx(pe, rel=1e-12)
    assert r["kappa"] == pytest.approx((pbar - pe) / (1 - pe), rel=1e-12)


def test_sample_entropy_constant_is_fully_regular(spark):
    from z_rad_spark.operators.profile import sample_entropy

    # constant signal: every template matches every other -> A = B,
    # sampen = -ln(1) = 0 (perfect regularity)
    rows = [("c1", i, "user", 4) for i in range(6)]
    r = sample_entropy(_turns(spark, rows)).collect()[0]
    assert r["sampen"] == pytest.approx(0.0, abs=1e-12)
    # standard index range i <= n-3: 4 templates -> C(4,2) = 6 pairs,
    # all matching at both m=2 and m=3 on a constant series
    assert r["b_count"] == 6 and r["a_count"] == 6


def test_sample_entropy_hand_computed(spark):
    from z_rad_spark.operators.profile import sample_entropy

    # 1, 2, 1, 2, 9: templates (1,2,1), (2,1,2), (1,2,9)
    # m=2 matches: all three pairs; m=3 matches: (t1,t2) only
    rows = [("c1", 0, "user", 1), ("c1", 1, "user", 2), ("c1", 2, "user", 1),
            ("c1", 3, "user", 2), ("c1", 4, "user", 9)]
    r = sample_entropy(_turns(spark, rows)).collect()[0]
    assert r["b_count"] == 3 and r["a_count"] == 1
    assert r["sampen"] == pytest.approx(math.log(3.0), rel=1e-12)


def test_naive_bayes_separable_langs(spark):
    from z_rad_spark.operators.text import naive_bayes_lang

    docs = spark.createDataFrame(
        [(1, "en", "the cat sat"), (2, "en", "the dog sat"),
         (3, "de", "der hund sass"), (4, "de", "die katze sass")],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in naive_bayes_lang(docs).collect()}
    assert all(out[i]["correct"] for i in (1, 2, 3, 4))
    assert all(out[i]["margin"] > 0 for i in (1, 2, 3, 4))
    assert out[1]["pred"] == "en" and out[3]["pred"] == "de"
