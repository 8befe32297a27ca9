"""Round-5 session-9 operator fixtures: hand-computed expectations for
the partition-agreement battery (adjusted_rand, vmeasure, label_purity)
and the distribution-distance battery."""

import math

import pytest


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "lang string, source string")


def test_adjusted_rand_perfect_agreement(spark):
    from z_rad_spark.operators.encoding import adjusted_rand

    df = _pairs(spark, [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")])
    r = adjusted_rand(df).collect()[0]
    assert r["n"] == 4
    assert r["rand"] == pytest.approx(1.0, rel=1e-12)
    assert r["ari"] == pytest.approx(1.0, rel=1e-12)
    assert r["fm"] == pytest.approx(1.0, rel=1e-12)


def test_adjusted_rand_crossed_partitions(spark):
    from z_rad_spark.operators.encoding import adjusted_rand

    # a = [1,1,2,2], b = [1,2,1,2]: every cell n_ij = 1
    # X = 0, A = B = 2 (in C(.,2) units), C = 6
    # RI = (6 + 0 - 2 - 2)/6 = 1/3; exp = 2*2/6 = 2/3
    # ARI = (0 - 2/3)/((2+2)/2 - 2/3) = -0.5; FM = 0
    df = _pairs(spark, [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")])
    r = adjusted_rand(df).collect()[0]
    assert r["rand"] == pytest.approx(1 / 3, rel=1e-12)
    assert r["ari"] == pytest.approx(-0.5, rel=1e-12)
    assert r["fm"] == pytest.approx(0.0, abs=1e-12)


def test_adjusted_rand_degenerate_single_row(spark):
    from z_rad_spark.operators.encoding import adjusted_rand

    r = adjusted_rand(_pairs(spark, [("a", "x")])).collect()[0]
    assert r["rand"] is None and r["ari"] is None and r["fm"] is None


def test_vmeasure_perfect(spark):
    from z_rad_spark.operators.encoding import vmeasure

    df = _pairs(spark, [("a", "x"), ("a", "x"), ("b", "y")])
    r = vmeasure(df).collect()[0]
    assert r["homogeneity"] == pytest.approx(1.0, rel=1e-12)
    assert r["completeness"] == pytest.approx(1.0, rel=1e-12)
    assert r["v"] == pytest.approx(1.0, rel=1e-12)
    assert r["nmi"] == pytest.approx(1.0, rel=1e-12)


def test_vmeasure_independent_is_zero(spark):
    from z_rad_spark.operators.encoding import vmeasure

    df = _pairs(spark, [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")])
    r = vmeasure(df).collect()[0]
    assert r["h_a"] == pytest.approx(math.log(2), rel=1e-12)
    assert r["h_b"] == pytest.approx(math.log(2), rel=1e-12)
    assert r["h_ab"] == pytest.approx(math.log(4), rel=1e-12)
    assert r["mi"] == pytest.approx(0.0, abs=1e-12)
    assert r["homogeneity"] == pytest.approx(0.0, abs=1e-12)
    assert r["completeness"] == pytest.approx(0.0, abs=1e-12)
    assert r["v"] == pytest.approx(0.0, abs=1e-12)
    assert r["nmi"] == pytest.approx(0.0, abs=1e-12)


def test_vmeasure_trivial_class_set_convention(spark):
    from z_rad_spark.operators.encoding import vmeasure

    # H(A) = 0 -> homogeneity = 1 (sklearn edge case); H(B) > 0 so
    # completeness = 1 - (H_ab - H_a)/H_b = 1 - H_b/H_b = 0 -> V = 0
    df = _pairs(spark, [("a", "x"), ("a", "y")])
    r = vmeasure(df).collect()[0]
    assert r["homogeneity"] == pytest.approx(1.0, rel=1e-12)
    assert r["completeness"] == pytest.approx(0.0, abs=1e-12)
    assert r["v"] == pytest.approx(0.0, abs=1e-12)
    assert r["nmi"] is None


def test_label_purity_hand_computed(spark):
    from z_rad_spark.operators.encoding import label_purity

    # clusters x: (a,a,b) majority a=2; y: (b,b) majority b=2
    # purity = 4/5; classes a: max in x = 2; b: max in y = 2
    # inv_purity = 4/5; F = 4/5
    df = _pairs(
        spark,
        [("a", "x"), ("a", "x"), ("b", "x"), ("b", "y"), ("b", "y")],
    )
    r = label_purity(df).collect()[0]
    assert r["n"] == 5
    assert r["purity"] == pytest.approx(0.8, rel=1e-12)
    assert r["inv_purity"] == pytest.approx(0.8, rel=1e-12)
    assert r["f_purity"] == pytest.approx(0.8, rel=1e-12)


def test_label_purity_tie_breaks_on_label_asc(spark):
    from z_rad_spark.operators.encoding import label_purity

    # cluster x split 1-1 between a and b: majority is 'a' (label asc)
    df = _pairs(spark, [("a", "x"), ("b", "x")])
    r = label_purity(df).collect()[0]
    assert r["purity"] == pytest.approx(0.5, rel=1e-12)
