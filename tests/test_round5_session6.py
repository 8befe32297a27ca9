"""Round-5 session-6 operator fixtures: hand-computed expectations for
l_diversity, gini_stump, err_at_k, cliffs_delta, ordinal_assoc,
friedman_test."""

import math

import pytest

from pyspark.sql import functions as F


def test_l_diversity_hand_computed(spark):
    from z_rad_spark.operators.curation import l_diversity

    # quasi classes: (g1): sensitive {a,a,b} -> l=2, 3 rows
    #                (g2): sensitive {a}     -> l=1, 1 row
    #                (g3): sensitive {a,b,c} -> l=3, 3 rows
    rows = [
        ("g1", 0, "a"), ("g1", 0, "a"), ("g1", 0, "b"),
        ("g2", 0, "a"),
        ("g3", 0, "a"), ("g3", 0, "b"), ("g3", 0, "c"),
    ]
    df = spark.createDataFrame(rows, "lang string, len_bucket long, source string")
    out = {
        r["l_value"]: r
        for r in l_diversity(
            df, quasi_cols=("lang", "len_bucket"), sensitive_col="source",
            l_threshold=3,
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 1
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 3
    assert out[3]["n_classes"] == 1 and out[3]["n_rows"] == 3
    # cumulative in ascending l: 1, 4, 7 of 7
    assert out[1]["cum_rows"] == 1 and out[2]["cum_rows"] == 4
    assert out[3]["cum_rows"] == 7
    assert out[2]["risk_share"] == pytest.approx(4.0 / 7.0, abs=1e-12)
    assert out[1]["below_l"] == 1 and out[2]["below_l"] == 1
    assert out[3]["below_l"] == 0


def test_gini_stump_perfect_split(spark):
    from z_rad_spark.operators.encoding import gini_stump

    # x <= 1 -> all False; x >= 5 -> all True: threshold 1 separates
    # perfectly, split impurity 0, gain = root gini = 0.5
    rows = [(0, False), (1, False), (5, True), (6, True)]
    df = spark.createDataFrame(rows, "n_chars long, label_true boolean")
    r = gini_stump(df).collect()[0]
    assert r["threshold"] == 1
    assert r["n"] == 4 and r["n_pos"] == 2
    assert r["n_left"] == 2 and r["n1_left"] == 0
    assert r["n_right"] == 2 and r["n1_right"] == 2
    assert r["gini_root"] == pytest.approx(0.5, abs=1e-12)
    assert r["gini_split"] == pytest.approx(0.0, abs=1e-12)
    assert r["gain"] == pytest.approx(0.5, abs=1e-12)


def test_gini_stump_tie_takes_smallest_threshold(spark):
    from z_rad_spark.operators.encoding import gini_stump

    # pure-noise label: every candidate split has identical impurity;
    # the (split ASC, threshold ASC) total order must pick the smallest
    rows = [(1, True), (1, False), (2, True), (2, False), (3, True), (3, False)]
    df = spark.createDataFrame(rows, "n_chars long, label_true boolean")
    r = gini_stump(df).collect()[0]
    assert r["threshold"] == 1
    assert r["gain"] == pytest.approx(0.0, abs=1e-12)


def test_err_at_k_hand_computed(spark):
    from z_rad_spark.operators.similarity import err_at_k

    # truth ranks items 10,20,30,40,50; result returns 10 at rank 1 and
    # misses with 99 at rank 2, then 20 at rank 3.
    res = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 20, 3)],
        "query_id long, vec_id long, rank int",
    )
    tru = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3), (1, 40, 4), (1, 50, 5)],
        "query_id long, vec_id long, rank int",
    )
    r = err_at_k(res, tru, k=5).collect()[0]
    assert r["n_hits"] == 2
    # R1 = 31/32 (truth rank 1), R2 = 0 (miss), R3 = 15/32 (truth rank 2)
    r1, r3 = 31.0 / 32.0, 15.0 / 32.0
    expected = r1 + (1 - r1) * 0.0 / 2.0 + (1 - r1) * (1 - 0.0) * r3 / 3.0
    assert r["err"] == pytest.approx(expected, abs=1e-12)


def test_err_at_k_perfect_result_tops_out(spark):
    from z_rad_spark.operators.similarity import err_at_k

    rows = [(7, 10 * i, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "query_id long, vec_id long, rank int")
    r = err_at_k(df, df, k=5).collect()[0]
    assert r["n_hits"] == 5
    # cascade sum with R = (31,15,7,3,1)/32 at ranks 1..5
    rs = [(2 ** (6 - i) - 1) / 32.0 for i in range(1, 6)]
    err, cont = 0.0, 1.0
    for i, ri in enumerate(rs, start=1):
        err += cont * ri / i
        cont *= 1 - ri
    assert r["err"] == pytest.approx(err, abs=1e-12)


def test_cliffs_delta_hand_computed(spark):
    from z_rad_spark.operators.drift import cliffs_delta

    # A = {1, 3, 3}, B = {2, 3}: pairs (a,b):
    # gt: 3>2 twice -> 2;  lt: 1<2, 1<3 -> 2;  tie: 3=3 twice -> 2
    rows = [(True, 1), (True, 3), (True, 3), (False, 2), (False, 3)]
    df = spark.createDataFrame(rows, "is_a boolean, n_chars long")
    r = cliffs_delta(df).collect()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert (r["gt"], r["lt"], r["tie"]) == (2, 2, 2)
    assert r["delta"] == pytest.approx(0.0, abs=1e-12)
    assert r["p_gt"] == pytest.approx(2.0 / 6.0, abs=1e-12)
    assert r["p_tie"] == pytest.approx(2.0 / 6.0, abs=1e-12)


def test_cliffs_delta_total_dominance(spark):
    from z_rad_spark.operators.drift import cliffs_delta

    rows = [(True, 10), (True, 11), (False, 1), (False, 2)]
    df = spark.createDataFrame(rows, "is_a boolean, n_chars long")
    r = cliffs_delta(df).collect()[0]
    assert r["delta"] == pytest.approx(1.0, abs=1e-12)
    assert r["p_lt"] == 0.0 and r["p_tie"] == 0.0


def test_ordinal_assoc_perfect_concordance(spark):
    from z_rad_spark.operators.drift import ordinal_assoc

    rows = [(i, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "x_bucket long, y_bucket long")
    r = ordinal_assoc(df).collect()[0]
    assert r["conc"] == 10 and r["disc"] == 0
    assert r["ties_x"] == 0 and r["ties_y"] == 0
    for c in ("gamma", "somers_dyx", "somers_dxy", "tau_b"):
        assert r[c] == pytest.approx(1.0, abs=1e-12)


def test_ordinal_assoc_hand_computed_with_ties(spark):
    from z_rad_spark.operators.drift import ordinal_assoc

    # (x,y): (1,1), (1,2), (2,1), (2,2), (2,2)
    # C: (1,1)-(2,2) x2 = 2;  D: (1,2)-(2,1) = 1
    # n=5, n0=10; x-marg {1:2, 2:3} -> n1 = 1+3 = 4; y-marg {1:2, 2:3} -> n2 = 4
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 2)]
    df = spark.createDataFrame(rows, "x_bucket long, y_bucket long")
    r = ordinal_assoc(df).collect()[0]
    assert (r["conc"], r["disc"]) == (2, 1)
    assert (r["ties_x"], r["ties_y"]) == (4, 4)
    assert r["gamma"] == pytest.approx(1.0 / 3.0, abs=1e-12)
    assert r["somers_dyx"] == pytest.approx(1.0 / 6.0, abs=1e-12)
    assert r["tau_b"] == pytest.approx(1.0 / 6.0, abs=1e-12)


def _mk_transcripts(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp, signal double"
    )


def test_friedman_hand_computed_no_ties(spark):
    from z_rad_spark.operators.drift import friedman_test

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    # two complete blocks; per-(conv,role) means:
    # c1: user 1, assistant 2, tool 3 -> ranks 1,2,3
    # c2: user 2, assistant 4, tool 6 -> ranks 1,2,3
    rows = []
    for conv, vals in (("c1", (1, 2, 3)), ("c2", (2, 4, 6))):
        for i, (role, v) in enumerate(zip(("user", "assistant", "tool"), vals)):
            rows.append((conv, i, role, t0, float(v)))
    r = friedman_test(_mk_transcripts(spark, rows)).collect()[0]
    assert r["b"] == 2 and r["k"] == 3
    # R = (2, 4, 6): chi2 = 12/(2*3*4) * (4+16+36) - 3*2*4 = 28 - 24 = 4
    assert r["chi2"] == pytest.approx(4.0, abs=1e-12)
    assert r["chi2_corrected"] == pytest.approx(4.0, abs=1e-12)
    assert r["kendalls_w"] == pytest.approx(1.0, abs=1e-12)


def test_friedman_excludes_incomplete_blocks(spark):
    from z_rad_spark.operators.drift import friedman_test

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "user", t0, 1.0),
        ("c1", 1, "assistant", t0, 2.0),
        ("c1", 2, "tool", t0, 3.0),
        ("c2", 0, "user", t0, 9.0),  # incomplete -> dropped
    ]
    r = friedman_test(_mk_transcripts(spark, rows)).collect()[0]
    assert r["b"] == 1


def test_friedman_all_tied_is_zero(spark):
    from z_rad_spark.operators.drift import friedman_test

    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for conv in ("c1", "c2"):
        for i, role in enumerate(("user", "assistant", "tool")):
            rows.append((conv, i, role, t0, 5.0))
    r = friedman_test(_mk_transcripts(spark, rows)).collect()[0]
    # every block fully tied: midranks all 2 -> chi2 = 0, correction
    # denominator 1 - b*24/(b*3*24) = 2/3 > 0 -> corrected 0 too
    assert r["chi2"] == pytest.approx(0.0, abs=1e-12)
    assert r["chi2_corrected"] == pytest.approx(0.0, abs=1e-12)
    assert r["kendalls_w"] == pytest.approx(0.0, abs=1e-12)
