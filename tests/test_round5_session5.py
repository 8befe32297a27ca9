"""Round-5 session-5 operator fixtures: hand-computed expectations for
adamic_adar, kmv_distinct_by, ar2_yule_walker."""

import datetime

import pytest

from pyspark.sql import functions as F


def test_adamic_adar_square_graph(spark):
    from z_rad_spark.operators.graph import adamic_adar

    # 4-cycle 1-2-4-3-1: the two diagonals (1,4) and (2,3) are the only
    # non-edges with common neighbours; every degree is 2, so
    # aa = 2/ln(2), cn = 2, jaccard = 2/(2+2-2) = 1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "id_a long, id_b long"
    )
    rows = {(r["u"], r["v"]): r for r in adamic_adar(edges, top_k=10).collect()}
    assert set(rows) == {(1, 4), (2, 3)}
    import math

    for key in rows:
        r = rows[key]
        assert r["cn"] == 2 and r["deg_u"] == 2 and r["deg_v"] == 2
        assert r["aa"] == pytest.approx(2.0 / math.log(2.0), abs=1e-12)
        assert r["jaccard"] == pytest.approx(1.0, abs=1e-12)


def test_adamic_adar_excludes_existing_edges(spark):
    from z_rad_spark.operators.graph import adamic_adar

    # triangle: every pair is an edge -> no predicted links at all
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long"
    )
    assert adamic_adar(edges, top_k=10).count() == 0


def test_kmv_exact_below_k(spark):
    from z_rad_spark.operators.sketches import kmv_distinct_by

    rows = [("a", i) for i in range(5)] + [("a", 2), ("b", 7)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    out = {r["event_type"]: r for r in kmv_distinct_by(df, k=64).collect()}
    assert out["a"]["exact_distinct"] == 5
    assert out["a"]["est_distinct"] == pytest.approx(5.0, abs=1e-12)
    assert out["a"]["kth_hash"] is None
    assert out["b"]["est_distinct"] == pytest.approx(1.0, abs=1e-12)


def test_kmv_estimate_replays_hash(spark):
    from z_rad_spark.operators.sketches import kmv_distinct_by

    P = 2147483647
    keys = list(range(100))

    def h(k):
        x = ((abs(k) % P) * 48271 + 12345) % P
        y = (x * x + x) % P
        return (y * 48271) % P

    hs = sorted({h(k) for k in keys})
    k = 16
    want = (k - 1) * float(P) / (hs[k - 1] + 1.0)
    df = spark.createDataFrame(
        [("g", i) for i in keys], "event_type string, user_id long"
    )
    r = kmv_distinct_by(df, k=k).collect()[0]
    assert r["kth_hash"] == hs[k - 1]
    assert r["est_distinct"] == pytest.approx(want, rel=1e-12)


def test_ar2_alternating_signal_hand_computed(spark):
    from z_rad_spark.operators.sessionize import ar2_yule_walker

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("c", i, t0 + datetime.timedelta(minutes=i), float(1 + i % 2))
        for i in range(6)  # signal 1,2,1,2,1,2
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, signal double"
    )
    r = ar2_yule_walker(df).collect()[0]
    # exact fractions worked out by hand: r1=-5/6, r2=2/3, disc=11/36
    assert r["r1"] == pytest.approx(-5 / 6, abs=1e-12)
    assert r["r2"] == pytest.approx(2 / 3, abs=1e-12)
    assert r["phi1"] == pytest.approx(-10 / 11, abs=1e-12)
    assert r["phi2"] == pytest.approx(-1 / 11, abs=1e-12)
    assert r["sigma_ratio"] == pytest.approx(10 / 33, abs=1e-12)
    # last two turns are x_n=2, x_{n-1}=1 -> forecast 12/11
    assert r["forecast"] == pytest.approx(12 / 11, abs=1e-12)


def test_ar2_constant_signal_null(spark):
    from z_rad_spark.operators.sessionize import ar2_yule_walker

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("c", i, t0 + datetime.timedelta(minutes=i), 3.0) for i in range(5)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, signal double"
    )
    r = ar2_yule_walker(df).collect()[0]
    assert r["n"] == 5
    assert r["r1"] is None and r["phi1"] is None and r["forecast"] is None


def test_adamic_adar_edge_flag_mode(spark):
    from z_rad_spark.operators.graph import adamic_adar

    # path 1-2-3: the only wedge pair is (1,3) (non-edge); with
    # exclude_edges=False it appears with is_edge=0; add edge (1,3)
    # and it flips to 1 with deg-3 centre weighting unchanged
    path = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    r = adamic_adar(path, top_k=5, exclude_edges=False).collect()
    assert [(x["u"], x["v"], x["is_edge"]) for x in r] == [(1, 3, 0)]
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long"
    )
    r2 = {(x["u"], x["v"]): x for x in
          adamic_adar(tri, top_k=5, exclude_edges=False).collect()}
    assert all(x["is_edge"] == 1 for x in r2.values())
    assert len(r2) == 3
