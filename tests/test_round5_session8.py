"""Round-5 session-8 operator fixtures: hand-computed expectations for
krippendorff_alpha, hedges_g, grubbs_max, lift_curve."""

import math

import pytest


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


def test_krippendorff_alpha_hand_computed(spark):
    from z_rad_spark.operators.drift import krippendorff_alpha

    # unit c1: categories (1, 1) -> m=2, disagreement 0
    # unit c2: categories (1, 2) -> m=2, disagreement (4-2)/1 = 2
    # unit c3: single rating -> dropped (m < 2)
    # n = 4; D_o = (0 + 2)/4 = 0.5
    # marginals over kept units: n_1 = 3, n_2 = 1
    # D_e = 3*1/(4*3) + 1*3/(4*3) = 0.5 -> alpha = 0
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 1),
        ("c2", 0, "user", 1), ("c2", 1, "user", 2),
        ("c3", 0, "user", 2),
    ]
    r = krippendorff_alpha(_turns(spark, rows)).collect()[0]
    assert r["n_units"] == 2 and r["n_values"] == 2
    assert r["d_o"] == pytest.approx(0.5, abs=1e-12)
    assert r["d_e"] == pytest.approx(0.5, abs=1e-12)
    assert r["alpha"] == pytest.approx(0.0, abs=1e-12)


def test_krippendorff_alpha_perfect_agreement(spark):
    from z_rad_spark.operators.drift import krippendorff_alpha

    rows = [("c1", i, "user", 3) for i in range(3)] + [
        ("c2", i, "user", 5) for i in range(4)
    ]
    r = krippendorff_alpha(_turns(spark, rows)).collect()[0]
    assert r["d_o"] == pytest.approx(0.0, abs=1e-12)
    assert r["alpha"] == pytest.approx(1.0, abs=1e-12)


def test_krippendorff_alpha_caps_raters(spark):
    from z_rad_spark.operators.drift import krippendorff_alpha

    # 8 scored turns but max_raters=5: only the first 5 count
    rows = [("c1", i, "user", 1 if i < 5 else 9) for i in range(8)]
    r = krippendorff_alpha(_turns(spark, rows), max_raters=5).collect()[0]
    # all five kept ratings identical -> zero observed disagreement,
    # single category -> D_e = 0 -> alpha NULL
    assert r["d_o"] == pytest.approx(0.0, abs=1e-12)
    assert r["d_e"] == pytest.approx(0.0, abs=1e-12)
    assert r["alpha"] is None


def test_hedges_g_hand_computed(spark):
    from z_rad_spark.operators.drift import hedges_g

    # user: [1, 3] -> mean 2, var 2; assistant: [2, 2, 5] -> mean 3, var 3
    # sp^2 = (1*2 + 2*3)/3 = 8/3; d = (2-3)/sqrt(8/3)
    # J = 1 - 3/(4*3 - 1) = 8/11
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 3),
        ("c2", 0, "assistant", 2), ("c2", 1, "assistant", 2),
        ("c2", 2, "assistant", 5),
        ("c3", 0, "system", 99),  # other roles excluded
    ]
    r = hedges_g(_turns(spark, rows)).collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 3
    sp = math.sqrt(8.0 / 3.0)
    assert r["sp"] == pytest.approx(sp, rel=1e-12)
    assert r["d"] == pytest.approx(-1.0 / sp, rel=1e-12)
    assert r["g"] == pytest.approx((8.0 / 11.0) * (-1.0 / sp), rel=1e-12)


def test_hedges_g_zero_spread_is_null(spark):
    from z_rad_spark.operators.drift import hedges_g

    rows = [
        ("c1", 0, "user", 4), ("c1", 1, "user", 4),
        ("c2", 0, "assistant", 4), ("c2", 1, "assistant", 4),
    ]
    r = hedges_g(_turns(spark, rows)).collect()[0]
    assert r["mean_a"] == pytest.approx(4.0)
    assert r["sp"] is None and r["d"] is None and r["g"] is None


def test_grubbs_hand_computed(spark):
    from z_rad_spark.operators.drift import grubbs_max

    # user: [1, 2, 9] -> mean 4, s = sqrt(19); x* = 9, G = 5/sqrt(19)
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 2), ("c1", 2, "user", 9),
        ("c2", 0, "assistant", 5), ("c2", 1, "assistant", 5),
    ]
    out = {r["group"]: r for r in grubbs_max(_turns(spark, rows)).collect()}
    u = out["user"]
    assert u["n"] == 3 and u["x_star"] == 9
    assert u["g"] == pytest.approx(5.0 / math.sqrt(19.0), rel=1e-12)
    # assistant: n=2 < 3 and s=0 -> NULL statistic
    a = out["assistant"]
    assert a["g"] is None


def test_grubbs_tie_breaks_low_value(spark):
    from z_rad_spark.operators.drift import grubbs_max

    # [1, 5, 9]: both 1 and 9 deviate by 4 from mean 5 -> tie broken
    # by value asc -> x* = 1
    rows = [("c1", i, "user", v) for i, v in enumerate((1, 5, 9))]
    r = grubbs_max(_turns(spark, rows)).collect()[0]
    assert r["x_star"] == 1
    assert r["g"] == pytest.approx(4.0 / 4.0, rel=1e-12)


def test_lift_curve_hand_computed(spark):
    from z_rad_spark.operators.encoding import lift_curve

    # 10 docs, probs descending 0.9..0.0; positives are the top 3 plus
    # one at rank 8 -> P = 4, N = 10; 5 quintiles of 2 rows each
    rows = [(i, 0.9 - 0.1 * i, i in (0, 1, 2, 7)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, prob double, label_true boolean")
    out = {r["decile"]: r for r in lift_curve(df, n_deciles=5).collect()}
    assert len(out) == 5
    # quintile 0: rows 0-1, both positive -> cum 2/2; lift = 1.0/(4/10)
    assert out[0]["cum_n"] == 2 and out[0]["cum_pos"] == 2
    assert out[0]["lift"] == pytest.approx(2.5, rel=1e-12)
    assert out[0]["capture"] == pytest.approx(0.5, rel=1e-12)
    # quintile 3 (rows 6-7) adds the rank-8 positive
    assert out[3]["cum_pos"] == 4
    assert out[3]["capture"] == pytest.approx(1.0, rel=1e-12)
    # final quintile: lift ends at exactly 1.0 by construction
    assert out[4]["cum_n"] == 10 and out[4]["cum_pos"] == 4
    assert out[4]["lift"] == pytest.approx(1.0, rel=1e-12)


def test_lift_curve_tie_break_is_deterministic(spark):
    from z_rad_spark.operators.encoding import lift_curve

    # all probs equal: ranking falls back to doc_id asc -> decile
    # membership fixed by id
    rows = [(i, 0.5, i < 2) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, prob double, label_true boolean")
    out = {r["decile"]: r for r in lift_curve(df, n_deciles=2).collect()}
    assert out[0]["n_pos"] == 2 and out[1]["n_pos"] == 0


def test_cohen_kappa_hand_computed(spark):
    from z_rad_spark.operators.drift import cohen_kappa

    # pairs: c1 (1,1), c2 (1,2), c3 (2,2); c4 has one scored turn -> drop
    # po = 2/3; rows (1:2, 2:1), cols (1:1, 2:2) -> S = 2+2 = 4, pe = 4/9
    # kappa = (2/3 - 4/9)/(1 - 4/9) = 0.4
    rows = [
        ("c1", 0, "user", 1), ("c1", 1, "user", 1),
        ("c2", 0, "user", 1), ("c2", 1, "user", 2),
        ("c3", 0, "user", 2), ("c3", 1, "user", 2),
        ("c4", 0, "user", 5),
    ]
    r = cohen_kappa(_turns(spark, rows)).collect()[0]
    assert r["n_items"] == 3 and r["n_agree"] == 2
    assert r["po"] == pytest.approx(2.0 / 3.0, rel=1e-12)
    assert r["pe"] == pytest.approx(4.0 / 9.0, rel=1e-12)
    assert r["kappa"] == pytest.approx(0.4, rel=1e-12)


def test_theil_u_deterministic_mapping_is_one(spark):
    from z_rad_spark.operators.drift import theil_u

    # x fully determines y -> H(y|x) = 0 -> U = 1
    df = spark.createDataFrame(
        [("a", "p"), ("a", "p"), ("b", "q")], "x string, y string"
    )
    r = theil_u(df, x_col="x", y_col="y").collect()[0]
    h_y = -(2.0 / 3.0 * math.log(2.0 / 3.0) + 1.0 / 3.0 * math.log(1.0 / 3.0))
    assert r["h_y"] == pytest.approx(h_y, rel=1e-12)
    assert r["h_y_given_x"] == pytest.approx(0.0, abs=1e-12)
    assert r["u"] == pytest.approx(1.0, rel=1e-12)


def test_theil_u_independent_is_zero(spark):
    from z_rad_spark.operators.drift import theil_u

    # perfectly balanced independent table: knowing x removes nothing
    df = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")], "x string, y string"
    )
    r = theil_u(df, x_col="x", y_col="y").collect()[0]
    assert r["u"] == pytest.approx(0.0, abs=1e-12)


def test_gk_lambda_hand_computed(spark):
    from z_rad_spark.operators.drift import gk_lambda

    # a -> p:3, q:1; b -> q:2. sum_modal = 3+2 = 5; marginals p:3, q:3
    # lambda = (5-3)/(6-3) = 2/3
    df = spark.createDataFrame(
        [("a", "p")] * 3 + [("a", "q")] + [("b", "q")] * 2, "x string, y string"
    )
    r = gk_lambda(df, x_col="x", y_col="y").collect()[0]
    assert r["n"] == 6 and r["sum_modal"] == 5 and r["modal_marginal"] == 3
    assert r["lam"] == pytest.approx(2.0 / 3.0, rel=1e-12)


def test_t_closeness_hand_computed(spark):
    from z_rad_spark.operators.curation import t_closeness

    # global levels {0: 2, 1: 2}; class A all level-0, class B all level-1
    # A: |2/2 - 2/4| + |2/2 - 4/4| = 0.5 -> t = 0.5/(2-1) = 0.5
    df = spark.createDataFrame(
        [("A", 0), ("A", 0), ("B", 1), ("B", 1)], "lang string, sensitive long"
    )
    out = {r["lang"]: r for r in t_closeness(df).collect()}
    assert out["A"]["t"] == pytest.approx(0.5, rel=1e-12)
    assert out["B"]["t"] == pytest.approx(0.5, rel=1e-12)


def test_t_closeness_matching_distribution_is_zero(spark):
    from z_rad_spark.operators.curation import t_closeness

    # both classes mirror the global mix exactly -> t = 0
    df = spark.createDataFrame(
        [("A", 0), ("A", 1), ("B", 0), ("B", 1)], "lang string, sensitive long"
    )
    out = {r["lang"]: r for r in t_closeness(df).collect()}
    assert out["A"]["t"] == pytest.approx(0.0, abs=1e-12)
    assert out["B"]["t"] == pytest.approx(0.0, abs=1e-12)


def test_kendall_w_perfect_concordance(spark):
    from z_rad_spark.operators.drift import kendall_w

    # every judge ranks positions identically (strictly increasing)
    rows = [(f"c{i}", j, "user", j + 1) for i in range(4) for j in range(3)]
    r = kendall_w(_turns(spark, rows)).collect()[0]
    assert r["m"] == 4 and r["tie_sum"] == 0
    assert r["w"] == pytest.approx(1.0, rel=1e-12)


def test_kendall_w_hand_computed_with_ties(spark):
    from z_rad_spark.operators.drift import kendall_w

    # judge c0 ranks (1, 2, 3) -> 2-ranks (2, 4, 6)
    # judge c1 ties all three (5, 5, 5) -> 2-ranks (4, 4, 4), T = 24
    # R2 = (6, 8, 10); m(k+1) = 8 -> S_num = 4 + 0 + 4 = 8
    # W = 3*8 / (4*24 - 2*24) = 24/48 = 0.5
    rows = [("c0", 0, "user", 1), ("c0", 1, "user", 2), ("c0", 2, "user", 3),
            ("c1", 0, "user", 5), ("c1", 1, "user", 5), ("c1", 2, "user", 5)]
    r = kendall_w(_turns(spark, rows)).collect()[0]
    assert r["m"] == 2 and r["s_num"] == 8 and r["tie_sum"] == 24
    assert r["w"] == pytest.approx(0.5, rel=1e-12)


def test_cronbach_alpha_hand_computed(spark):
    from z_rad_spark.operators.drift import cronbach_alpha

    # cases: (1,1,1), (2,2,2), (3,3,3) -> perfectly consistent items
    # var_j = 1 each (sum 3); totals (3, 6, 9) -> var_T = 9
    # alpha = 1.5 * (1 - 3/9) = 1.0
    rows = [(f"c{i}", j, "user", i + 1) for i in range(3) for j in range(3)]
    r = cronbach_alpha(_turns(spark, rows)).collect()[0]
    assert r["m"] == 3
    assert r["sum_item_var"] == pytest.approx(3.0, rel=1e-12)
    assert r["var_total"] == pytest.approx(9.0, rel=1e-12)
    assert r["alpha"] == pytest.approx(1.0, rel=1e-12)


def test_cronbach_alpha_independent_items_near_zero(spark):
    from z_rad_spark.operators.drift import cronbach_alpha

    # anti-correlated items: totals constant -> var_T = 0 -> alpha NULL
    rows = [("c0", 0, "user", 1), ("c0", 1, "user", 3), ("c0", 2, "user", 2),
            ("c1", 0, "user", 3), ("c1", 1, "user", 1), ("c1", 2, "user", 2),
            ("c2", 0, "user", 2), ("c2", 1, "user", 2), ("c2", 2, "user", 2)]
    r = cronbach_alpha(_turns(spark, rows)).collect()[0]
    assert r["var_total"] == pytest.approx(0.0, abs=1e-12)
    assert r["alpha"] is None


def test_mood_median_hand_computed(spark):
    from z_rad_spark.operators.drift import mood_median

    # pooled values 1..6 -> n=6, lower median position floor(7/2)=3 -> med=3
    # group a: (1,2,3) -> above=0, lte=3; group b: (4,5,6) -> above=3, lte=0
    # E = 1.5 everywhere -> chi2 = 4 * (1.5^2/1.5) = 6
    rows = [("c1", i, "a", v) for i, v in enumerate((1, 2, 3))] + [
        ("c2", i, "b", v) for i, v in enumerate((4, 5, 6))
    ]
    r = mood_median(_turns(spark, rows), group_col="role").collect()[0]
    assert r["n"] == 6 and r["median"] == 3 and r["n_groups"] == 2
    assert r["chi2"] == pytest.approx(6.0, rel=1e-12)


def test_mood_median_identical_groups_zero(spark):
    from z_rad_spark.operators.drift import mood_median

    rows = [("c1", i, "a", v) for i, v in enumerate((1, 2, 3, 4))] + [
        ("c2", i, "b", v) for i, v in enumerate((1, 2, 3, 4))
    ]
    r = mood_median(_turns(spark, rows), group_col="role").collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-12)


def _surv_turns(spark, rows):
    # rows: (conv_id, minute, role) -> ts at given minute offset
    data = [(c, i, r, f"2024-01-01 00:{m:02d}:00") for i, (c, m, r) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, ts string"
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_rmst_hand_computed(spark):
    from z_rad_spark.operators.profile import rmst

    # c1: starts min 0, first tool at min 2 -> event bucket 2
    # c2: starts min 0, no tool, last turn min 4 -> censored bucket 4
    # KM: S=1 on [0,2), drops to 0.5 at t=2, censor at 4 (no drop)
    # RMST(tau=10) = 1*2 + 0.5*(4-2)... careful: steps at event buckets
    rows = [("c1", 0, "user"), ("c1", 2, "tool"),
            ("c2", 0, "user"), ("c2", 4, "assistant")]
    r = rmst(_surv_turns(spark, rows), tau_buckets=10, bucket_s=60).collect()[0]
    # intervals: [0,2) S=1 -> 2; [2,4) S=0.5 -> 1; [4,10) S=0.5 -> 3
    # (censoring at 4 doesn't change S) => rmst = 6 buckets = 360 s
    assert r["tau_s"] == 600 and r["n_conv"] == 2
    assert r["rmst_s"] == pytest.approx(360.0, rel=1e-12)


def test_rmst_all_immediate_events_is_zero(spark):
    from z_rad_spark.operators.profile import rmst

    # tool call in the same minute as the first turn -> duration 0 ->
    # S drops to 0 at t=0 -> area 0
    rows = [("c1", 0, "tool"), ("c2", 0, "tool")]
    r = rmst(_surv_turns(spark, rows), tau_buckets=5, bucket_s=60).collect()[0]
    assert r["rmst_s"] == pytest.approx(0.0, abs=1e-12)


def test_bloom_fpr_properties(spark):
    from z_rad_spark.operators.sketches import bloom_fpr

    mem = spark.createDataFrame([(f"m{i}",) for i in range(50)], "token string")
    probes = spark.createDataFrame([(f"p{i}",) for i in range(200)], "token string")
    r = bloom_fpr(mem, probes, m_bits=64, k_hashes=3).collect()[0]
    assert r["n_members"] == 50
    # bits bounded by both the bit-array and total insertions
    assert 1 <= r["n_bits_set"] <= min(64, 150)
    assert r["n_test"] == 200
    assert 0 <= r["n_fp"] <= 200
    assert r["fpr"] == pytest.approx(r["n_fp"] / 200.0, rel=1e-9)
    fill = r["n_bits_set"] / 64.0
    assert r["expected_fpr"] == pytest.approx(fill ** 3, rel=1e-9)


def test_bloom_fpr_members_excluded_from_probes(spark):
    from z_rad_spark.operators.sketches import bloom_fpr

    mem = spark.createDataFrame([("a",), ("b",)], "token string")
    r = bloom_fpr(mem, mem, m_bits=64).collect()[0]
    assert r["n_test"] == 0 and r["n_fp"] == 0 and r["fpr"] is None


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ild_orthonormal_corpus_is_one(spark):
    from z_rad_spark.operators.similarity import intra_list_diversity

    vecs = _emb_df(
        spark, [(i, [1.0 if j == i else 0.0 for j in range(5)]) for i in range(5)]
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0, 0.0])], "query_id long, query_vec array<double>"
    )
    r = intra_list_diversity(vecs, q, k=5).collect()[0]
    assert r["n_pairs"] == 10
    assert r["ild"] == pytest.approx(1.0, rel=1e-12)


def test_ild_identical_corpus_is_zero(spark):
    from z_rad_spark.operators.similarity import intra_list_diversity

    vecs = _emb_df(spark, [(i, [0.6, 0.8]) for i in range(4)])
    q = spark.createDataFrame(
        [(0, [0.6, 0.8])], "query_id long, query_vec array<double>"
    )
    r = intra_list_diversity(vecs, q, k=4).collect()[0]
    assert r["n_pairs"] == 6
    assert r["ild"] == pytest.approx(0.0, abs=1e-12)


def test_heaps_law_linear_growth_beta_one(spark):
    from z_rad_spark.operators.text import heaps_law

    # doc i contributes exactly one NEW token -> V(n) = n -> beta = 1, K = 1
    docs = spark.createDataFrame(
        [(i, f"tok{i}") for i in range(10)], "doc_id long, text string"
    )
    r = heaps_law(docs).collect()[0]
    assert r["n_docs"] == 10 and r["n_points"] >= 2
    assert r["beta"] == pytest.approx(1.0, rel=1e-9)
    assert r["k"] == pytest.approx(1.0, rel=1e-9)


def test_heaps_law_saturated_vocab_beta_zero(spark):
    from z_rad_spark.operators.text import heaps_law

    # same single token everywhere -> V constant at 1 -> beta = 0
    docs = spark.createDataFrame(
        [(i, "same") for i in range(10)], "doc_id long, text string"
    )
    r = heaps_law(docs).collect()[0]
    assert r["beta"] == pytest.approx(0.0, abs=1e-9)
    assert r["k"] == pytest.approx(1.0, rel=1e-9)


def test_benford_all_leading_ones(spark):
    import math
    from z_rad_spark.operators.drift import benford_test

    df = spark.createDataFrame([(v,) for v in (1, 10, 12, 150, 1999)], "n_chars long")
    r = benford_test(df).collect()[0]
    n = 5
    p = [math.log10(1 + 1 / d) for d in range(1, 10)]
    chi2 = sum(((n if d == 1 else 0) - n * p[d - 1]) ** 2 / (n * p[d - 1]) for d in range(1, 10))
    mad = sum(abs((1.0 if d == 1 else 0.0) - p[d - 1]) for d in range(1, 10)) / 9.0
    assert r["n"] == 5
    assert r["chi2"] == pytest.approx(chi2, rel=1e-10)
    assert r["mad"] == pytest.approx(mad, rel=1e-10)


def test_acf_profile_monotone_sequence(spark):
    from z_rad_spark.operators.drift import acf_profile

    rows = [("c1", i, "user", i + 1) for i in range(4)]
    out = {r["lag"]: r for r in acf_profile(_turns(spark, rows)).collect()}
    assert out[1]["n_pairs"] == 3 and out[1]["r"] == pytest.approx(1.0, rel=1e-12)
    assert out[2]["n_pairs"] == 2 and out[2]["r"] == pytest.approx(1.0, rel=1e-12)
    # single lag-3 pair: zero variance -> NULL
    assert out[3]["n_pairs"] == 1 and out[3]["r"] is None


def test_acf_profile_does_not_cross_conversations(spark):
    from z_rad_spark.operators.drift import acf_profile

    rows = [("c1", 0, "user", 1), ("c2", 0, "user", 9)]
    out = acf_profile(_turns(spark, rows)).collect()
    assert out == []  # no within-conv pairs at any lag


def test_lin_ccc_anti_correlated(spark):
    from z_rad_spark.operators.drift import lin_ccc

    # pairs (1,2) and (2,1): r = -1 and, means equal, ccc = -1
    rows = [("c1", 0, "user", 1), ("c1", 1, "user", 2),
            ("c2", 0, "user", 2), ("c2", 1, "user", 1)]
    r = lin_ccc(_turns(spark, rows)).collect()[0]
    assert r["n_pairs"] == 2
    assert r["r"] == pytest.approx(-1.0, rel=1e-12)
    assert r["ccc"] == pytest.approx(-1.0, rel=1e-12)


def test_lin_ccc_identity_pairs(spark):
    from z_rad_spark.operators.drift import lin_ccc

    # y == x exactly (three repeats then a jump, two convs)
    rows = [("c1", 0, "user", 3), ("c1", 1, "user", 3), ("c1", 2, "user", 3),
            ("c2", 0, "user", 7), ("c2", 1, "user", 7)]
    r = lin_ccc(_turns(spark, rows)).collect()[0]
    assert r["ccc"] == pytest.approx(1.0, rel=1e-12)


def test_page_trend_hand_computed(spark):
    from z_rad_spark.operators.drift import page_trend

    # two judges, both strictly increasing: per judge L2 = 2+8+18 = 28
    # L = 28, E = 12m = 24, Var = 2m = 4 -> z = (28-24)/2 = 2
    rows = [(f"c{i}", j, "user", j + 1) for i in range(2) for j in range(3)]
    r = page_trend(_turns(spark, rows)).collect()[0]
    assert r["m"] == 2 and r["l2"] == 56 and r["tie_sum"] == 0
    assert r["l_stat"] == pytest.approx(28.0)
    assert r["e_l"] == pytest.approx(24.0)
    assert r["z"] == pytest.approx(2.0, rel=1e-12)


def test_page_trend_ties_suppress_z(spark):
    from z_rad_spark.operators.drift import page_trend

    rows = [("c1", 0, "user", 5), ("c1", 1, "user", 5), ("c1", 2, "user", 7)]
    r = page_trend(_turns(spark, rows)).collect()[0]
    assert r["tie_sum"] > 0 and r["z"] is None
    assert r["l_stat"] is not None


def test_bland_altman_hand_computed(spark):
    from z_rad_spark.operators.drift import bland_altman

    import math
    # user->assistant diffs: 2-1=1 and 7-4=3 -> mean 2, sd sqrt(2)
    rows = [("c1", 0, "user", 1), ("c1", 1, "assistant", 2),
            ("c2", 0, "user", 4), ("c2", 1, "assistant", 7),
            ("c3", 0, "assistant", 9), ("c3", 1, "user", 9)]  # wrong order: skipped
    r = bland_altman(_turns(spark, rows)).collect()[0]
    assert r["n_pairs"] == 2
    assert r["mean_diff"] == pytest.approx(2.0)
    assert r["sd_diff"] == pytest.approx(math.sqrt(2.0), rel=1e-12)
    assert r["loa_low"] == pytest.approx(2.0 - 1.96 * math.sqrt(2.0), rel=1e-12)
    assert r["loa_high"] == pytest.approx(2.0 + 1.96 * math.sqrt(2.0), rel=1e-12)


def test_confusion_stats_hand_computed(spark):
    from z_rad_spark.operators.encoding import confusion_stats

    import math
    # tp=2, fp=1, fn=1, tn=2
    rows = [(0.9, True), (0.8, True), (0.7, False),
            (0.3, True), (0.2, False), (0.1, False)]
    df = spark.createDataFrame(rows, "prob double, label_true boolean")
    r = confusion_stats(df).collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 2)
    assert r["precision"] == pytest.approx(2 / 3, rel=1e-12)
    assert r["recall"] == pytest.approx(2 / 3, rel=1e-12)
    assert r["f1"] == pytest.approx(2 / 3, rel=1e-12)
    assert r["accuracy"] == pytest.approx(4 / 6, rel=1e-12)
    mcc = (2 * 2 - 1 * 1) / math.sqrt(3 * 3 * 3 * 3)
    assert r["mcc"] == pytest.approx(mcc, rel=1e-12)


def test_confusion_stats_degenerate_is_null(spark):
    from z_rad_spark.operators.encoding import confusion_stats

    df = spark.createDataFrame([(0.9, True)], "prob double, label_true boolean")
    r = confusion_stats(df).collect()[0]
    assert r["precision"] == pytest.approx(1.0)
    assert r["mcc"] is None  # empty negative margins


def test_score_ks_perfect_separation(spark):
    from z_rad_spark.operators.encoding import score_ks

    rows = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    df = spark.createDataFrame(rows, "prob double, label_true boolean")
    r = score_ks(df).collect()[0]
    assert r["n_pos"] == 2 and r["n_neg"] == 2
    assert r["ks"] == pytest.approx(1.0, rel=1e-12)
    # max gap reached once all negatives consumed: smallest such score
    assert r["at_score"] == pytest.approx(0.2)


def test_score_ks_no_separation_is_zero_gap(spark):
    from z_rad_spark.operators.encoding import score_ks

    rows = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
    df = spark.createDataFrame(rows, "prob double, label_true boolean")
    r = score_ks(df).collect()[0]
    assert r["ks"] == pytest.approx(0.0, abs=1e-12)


def test_source_jaccard_hand_computed(spark):
    from z_rad_spark.operators.curation import source_jaccard

    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "b c d", "s2"), (3, "x y", "s3")],
        "doc_id long, text string, source string",
    )
    out = {(r["src_a"], r["src_b"]): r for r in source_jaccard(docs).collect()}
    r12 = out[("s1", "s2")]
    assert r12["v_a"] == 3 and r12["v_b"] == 3 and r12["inter"] == 2
    assert r12["jaccard"] == pytest.approx(0.5, rel=1e-12)
    # disjoint vocabularies never emit a row
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_source_kl_identical_mix_is_zero(spark):
    from z_rad_spark.operators.curation import source_kl

    docs = spark.createDataFrame(
        [(1, "a b", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_kl(docs).collect()}
    assert out["s1"]["kl"] == pytest.approx(0.0, abs=1e-12)
    assert out["s2"]["kl"] == pytest.approx(0.0, abs=1e-12)


def test_source_kl_skewed_source_positive(spark):
    import math
    from z_rad_spark.operators.curation import source_kl

    # corpus: a x3, b x1; s1 = (a,a), s2 = (a,b)
    # P_c(a) = 3/4, P_c(b) = 1/4
    # KL(s1) = 1 * ln(1/(3/4)) = ln(4/3)
    docs = spark.createDataFrame(
        [(1, "a a", "s1"), (2, "a b", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_kl(docs).collect()}
    assert out["s1"]["kl"] == pytest.approx(math.log(4.0 / 3.0), rel=1e-12)
    kl2 = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    assert out["s2"]["kl"] == pytest.approx(kl2, rel=1e-12)
