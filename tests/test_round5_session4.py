"""Hand-computed fixtures for the round-5 session-4 additions:
k-core peeling, degree assortativity, Kneser-Ney bigram LM, isotonic
(PAVA) fit, k-anonymity audit, and the BPE merge step."""

import datetime as dt
import math

import pytest

from z_rad_spark.operators.curation import k_anonymity, kneser_ney_logprob
from z_rad_spark.operators.encoding import isotonic_fit
from z_rad_spark.operators.graph import degree_assortativity, kcore_peel
from z_rad_spark.operators.text import bpe_top_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_kcore_peels_chain_keeps_clique(spark):
    # triangle {1,2,3} + tail 3-4-5, k=2:
    # round1 drops the leaf 5, round2 drops the newly exposed leaf 4,
    # round3 reaches the fixpoint (the triangle), round4 confirms it
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)])
    rows = {r["round"]: r for r in kcore_peel(e, k=2, n_rounds=4).collect()}
    assert (rows[0]["n_nodes"], rows[0]["n_edges"]) == (5, 5)
    assert (rows[1]["n_nodes"], rows[1]["n_edges"]) == (4, 4)
    assert (rows[2]["n_nodes"], rows[2]["n_edges"]) == (3, 3)
    assert (rows[3]["n_nodes"], rows[3]["n_edges"]) == (3, 3)
    assert [rows[r]["converged"] for r in range(5)] == [0, 0, 0, 1, 1]


def test_kcore_dedups_and_ignores_orientation(spark):
    # duplicate + reversed edges collapse to one undirected edge
    e = _edges(spark, [(1, 2), (2, 1), (1, 2)])
    r0 = {r["round"]: r for r in kcore_peel(e, k=1, n_rounds=1).collect()}
    assert (r0[0]["n_nodes"], r0[0]["n_edges"]) == (2, 1)
    assert (r0[1]["n_nodes"], r0[1]["n_edges"]) == (2, 1)
    assert r0[1]["converged"] == 1


def test_assortativity_star_is_minus_one(spark):
    # star: hub degree 3, leaves degree 1 -> perfectly disassortative
    e = _edges(spark, [(1, 2), (1, 3), (1, 4)])
    r = degree_assortativity(e).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (4, 3)
    # M=6 directed edges: S_j = 3*3 + 3*1 = 12, S_jk = 6*3 = 18,
    # S_jj = 3*9 + 3*1 = 30 -> r = (6*18 - 144)/(6*30 - 144) = -1
    assert (r["s_j"], r["s_jk"], r["s_jj"]) == (12, 18, 30)
    assert r["assortativity"] == pytest.approx(-1.0, abs=1e-12)


def test_assortativity_regular_graph_is_null(spark):
    # triangle: every degree 2 -> zero degree variance -> undefined
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    r = degree_assortativity(e).collect()[0]
    assert r["assortativity"] is None


def test_kneser_ney_hand_computed(spark):
    # corpus: two copies of "a b". N=4, tf(a)=tf(b)=2; bigram (a,b) c=2;
    # ctx(a) = 2, N1+(a,.) = 1; N1+(.,b) = 1; |bigram types| B = 1.
    # doc: pos0 'a' -> ln(2/4); pos1 'b' ->
    #   (max(2-0.75,0) + 0.75*1*(1/1)) / 2 = (1.25 + 0.75)/2 = 1.0 -> ln 1
    # nll = -(ln 0.5 + 0)/2 = ln(2)/2, ppl = sqrt(2)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in kneser_ney_logprob(docs).collect()}
    for d in (0, 1):
        assert rows[d]["n_tokens"] == 2
        assert rows[d]["nll"] == pytest.approx(math.log(2.0) / 2.0, abs=1e-12)
        assert rows[d]["ppl"] == pytest.approx(math.sqrt(2.0), abs=1e-12)


def test_kneser_ney_observed_bigrams_all_positive(spark):
    # every scored probability is > 0 on the training corpus itself
    docs = spark.createDataFrame(
        [(0, "x y z"), (1, "y z x"), (2, "z x y")], "doc_id long, text string"
    )
    out = kneser_ney_logprob(docs).collect()
    assert len(out) == 3
    for r in out:
        assert r["nll"] is not None and math.isfinite(r["nll"])
        assert r["ppl"] > 0


def _turns(spark, signals):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("c1", i, t0 + dt.timedelta(minutes=i), float(s))
        for i, s in enumerate(signals)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, signal double"
    )


def test_isotonic_pools_violators(spark):
    # [3,1,2,5,4]: PAVA pools [3,1] -> 2, keeps [2] (equal means allowed),
    # pools [5,4] -> 4.5
    out = isotonic_fit(_turns(spark, [3, 1, 2, 5, 4]))
    fits = [r["iso_fit"] for r in sorted(out.collect(), key=lambda r: r["turn_idx"])]
    assert fits == [2.0, 2.0, 2.0, 4.5, 4.5]


def test_isotonic_monotone_and_mean_preserving(spark):
    sig = [5, 3, 8, 1, 9, 2, 2, 7]
    out = isotonic_fit(_turns(spark, sig)).collect()
    rows = sorted(out, key=lambda r: r["turn_idx"])
    fits = [r["iso_fit"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:]))
    # L2 isotonic fit preserves the total mass
    assert sum(fits) == pytest.approx(sum(sig), abs=1e-9)
    # already-monotone input is returned unchanged
    mono = isotonic_fit(_turns(spark, [1, 2, 2, 5])).collect()
    assert sorted(r["iso_fit"] for r in mono) == [1.0, 2.0, 2.0, 5.0]


def test_k_anonymity_distribution(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(3)] + [(3, "fr")], "doc_id long, lang string"
    )
    rows = {r["class_size"]: r for r in k_anonymity(docs, quasi_cols=("lang",), k=5).collect()}
    assert (rows[1]["n_classes"], rows[1]["n_rows"], rows[1]["cum_rows"]) == (1, 1, 1)
    assert (rows[3]["n_classes"], rows[3]["n_rows"], rows[3]["cum_rows"]) == (1, 3, 4)
    assert rows[1]["risk_share"] == pytest.approx(0.25, abs=1e-12)
    assert rows[3]["risk_share"] == pytest.approx(1.0, abs=1e-12)
    assert (rows[1]["below_k"], rows[3]["below_k"]) == (1, 1)
    rows10 = {
        r["class_size"]: r
        for r in k_anonymity(docs, quasi_cols=("lang",), k=2).collect()
    }
    assert (rows10[1]["below_k"], rows10[3]["below_k"]) == (1, 0)


def test_bpe_top_pairs_hand_computed(spark):
    # vocab: abc(x1), ab(x1) -> pairs: "a b" 2, "b c" 1
    docs = spark.createDataFrame([(0, "abc ab")], "doc_id long, text string")
    rows = bpe_top_pairs(docs, k=15).collect()
    got = {(r["pair"], r["merged"], r["n"], r["rank"]) for r in rows}
    assert got == {("a b", "ab", 2, 1), ("b c", "bc", 1, 2)}


def test_bpe_weighting_and_tiebreak(spark):
    # "zz" twice outweighs the unique word's pairs; ties break on pair asc
    docs = spark.createDataFrame(
        [(0, "zz zz pq"), (1, "zz")], "doc_id long, text string"
    )
    rows = sorted(bpe_top_pairs(docs, k=15).collect(), key=lambda r: r["rank"])
    assert (rows[0]["pair"], rows[0]["n"]) == ("z z", 3)
    assert (rows[1]["pair"], rows[1]["n"]) == ("p q", 1)


def test_dbscan_labels_hand_graph(spark):
    # 5 identical vectors (pairwise cosine 1.0) + 1 orthogonal:
    # with exact=LSH all five collide in every bucket; minPts=4 ->
    # the five are core (4 neighbors each), the loner is noise
    import pyspark.sql.functions as F

    from z_rad_spark.operators.similarity import dbscan_labels

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    orth = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [(i, base) for i in range(5)] + [(9, orth)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in dbscan_labels(vecs, threshold=0.9, min_pts=4, dim=dim).collect()}
    for i in range(5):
        assert (out[i]["n_neighbors"], out[i]["label"]) == (4, "core")
    assert out[9]["label"] == "noise" and out[9]["n_neighbors"] == 0


def test_dbscan_border_and_noise_on_hand_graph(spark):
    # labeling semantics on an explicit candidate-pair graph (the
    # exact-truth seam — LSH recall plays no part here):
    # edges {1-2, 2-3, 3-4, 4-1, 1-3, 5-1}; minPts=3
    # deg: 1->4 core, 3->3 core, 2/4 -> 2 border (touch cores), 5 -> 1
    # border (touches core 1), 6 -> isolated noise
    from z_rad_spark.operators.similarity import dbscan_labels

    vecs = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in (1, 2, 3, 4, 5, 6)],
        "vec_id long, embedding array<double>",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3), (1, 5)],
        "vec_id_a long, vec_id_b long",
    )
    out = {
        r["vec_id"]: r
        for r in dbscan_labels(vecs, min_pts=3, pairs=pairs).collect()
    }
    assert (out[1]["n_neighbors"], out[1]["label"]) == (4, "core")
    assert (out[3]["n_neighbors"], out[3]["label"]) == (3, "core")
    assert (out[2]["label"], out[4]["label"], out[5]["label"]) == (
        "border",
        "border",
        "border",
    )
    assert (out[6]["n_neighbors"], out[6]["label"]) == (0, "noise")


def test_wl_fingerprint_groups_isomorphic_shapes(spark):
    import datetime as dt

    from z_rad_spark.operators.graph import wl_conversation_fingerprint

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def conv(cid, roles):
        return [
            (cid, i, roles[i % len(roles)], t0 + dt.timedelta(minutes=i))
            for i in range(len(roles))
        ]

    # c1 and c2: identical user->assistant alternation (same multigraph);
    # c3: user->assistant->tool cycle (different shape)
    rows = (
        conv("c1", ["user", "assistant"] * 3)
        + conv("c2", ["user", "assistant"] * 3)
        + conv("c3", ["user", "assistant", "tool"] * 2)
    )
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, ts timestamp")
    out = wl_conversation_fingerprint(df, n_rounds=2).collect()
    by_rep = {r["rep_conv"]: r for r in out}
    assert len(out) == 2
    assert by_rep["c1"]["n_convs"] == 2  # c1+c2 share a fingerprint
    assert by_rep["c3"]["n_convs"] == 1


def test_wl_fingerprint_sensitive_to_multiplicity(spark):
    import datetime as dt

    from z_rad_spark.operators.graph import wl_conversation_fingerprint

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # c1: u->a once; c2: u->a->u->a (same node set, different edge counts)
    for cid, roles in (("c1", ["user", "assistant"]), ("c2", ["user", "assistant", "user", "assistant"])):
        rows += [
            (cid, i, roles[i], t0 + dt.timedelta(minutes=i)) for i in range(len(roles))
        ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, ts timestamp")
    out = wl_conversation_fingerprint(df, n_rounds=2).collect()
    assert len(out) == 2 and all(r["n_convs"] == 1 for r in out)


def test_assoc_rules_hand_computed(spark):
    from z_rad_spark.operators.profile import assoc_rules

    # baskets: u1={a,b}, u2={a,b}, u3={a}, u4={} (itemless, counts in N)
    rows = [
        (1, "a"), (1, "b"), (1, "a"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = assoc_rules(df, top_k=10).collect()
    assert len(out) == 1
    r = out[0]
    # N=4, n_a=3, n_b=2, n_ab=2
    assert (r["item_a"], r["item_b"], r["n_a"], r["n_b"], r["n_ab"]) == ("a", "b", 3, 2, 2)
    assert r["support"] == pytest.approx(0.5, abs=1e-12)
    assert r["conf_ab"] == pytest.approx(2 / 3, abs=1e-12)
    assert r["conf_ba"] == pytest.approx(1.0, abs=1e-12)
    assert r["lift"] == pytest.approx(4 * 2 / (3 * 2), abs=1e-12)


def test_conformal_interval_hand_computed(spark):
    from z_rad_spark.operators.drift import conformal_interval

    # calibration (before split): role u signals [1,1,1,3]
    #   mean_ref = 1.5, residuals [0.5 x3, 1.5], k = ceil(0.9*5)=5 -> cap 4
    #   radius = 1.5 (max residual)
    # deployment: [1, 2, 9] -> residuals [0.5, 0.5, 7.5] -> coverage 2/3
    t0 = dt.datetime(2024, 1, 10, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 20, 0, 0, 0)
    rows = [("c1", i, t0 + dt.timedelta(minutes=i), "user", float(s)) for i, s in enumerate([1, 1, 1, 3])]
    rows += [("c1", 10 + i, t1 + dt.timedelta(minutes=i), "user", float(s)) for i, s in enumerate([1, 2, 9])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, role string, signal double"
    )
    r = conformal_interval(df, split_ts="2024-01-15 00:00:00", level_pct=90).collect()[0]
    assert (r["n_ref"], r["n_cur"]) == (4, 3)
    assert r["mean_ref"] == pytest.approx(1.5, abs=1e-12)
    assert r["radius"] == pytest.approx(1.5, abs=1e-12)
    assert r["coverage"] == pytest.approx(2 / 3, abs=1e-12)


def test_conformal_radius_rank_threshold(spark):
    from z_rad_spark.operators.drift import conformal_interval

    # 19 residuals of 0 and 1 of 10: k = ceil(0.9*21) = 19 -> radius 0
    t0 = dt.datetime(2024, 1, 10, 0, 0, 0)
    sigs = [5.0] * 19 + [15.0]
    rows = [("c1", i, t0 + dt.timedelta(minutes=i), "user", s) for i, s in enumerate(sigs)]
    rows += [("c1", 99, dt.datetime(2024, 1, 20), "user", 5.5)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, role string, signal double"
    )
    r = conformal_interval(df, split_ts="2024-01-15 00:00:00", level_pct=90).collect()[0]
    # mean_ref = (19*5 + 15)/20 = 5.5; residuals: 0.5 x19, 9.5 x1
    # k = ceil(0.9*21) = 19 -> radius = 0.5; deployment residual 0 <= 0.5
    assert r["radius"] == pytest.approx(0.5, abs=1e-12)
    assert r["coverage"] == pytest.approx(1.0, abs=1e-12)


def test_confident_learning_hand_computed(spark):
    from z_rad_spark.operators.encoding import confident_learning_noise

    # labeled 1: probs [0.9, 0.8, 0.2] -> t_pos = 19/30
    # labeled 0: probs [0.1, 0.3] -> p0 = [0.9, 0.7] -> t_neg = 0.8
    # assignments (p1>=t_pos clears 0.9, 0.8; p0>=0.8 clears p=0.1,0.2):
    #   y=1 p=0.9 -> yhat 1 (c11); y=1 p=0.8 -> yhat 1 (c11)
    #   y=1 p=0.2 -> p0=0.8 >= t_neg -> yhat 0 (c10)
    #   y=0 p=0.1 -> yhat 0 (c00); y=0 p=0.3 -> p0=0.7 < 0.8, p=0.3 < t_pos
    #     -> abstain
    # noise = c10 / 5 confident = 1/4
    rows = [
        (0, 0.9, True), (1, 0.8, True), (2, 0.2, True),
        (3, 0.1, False), (4, 0.3, False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, prob double, label_true boolean")
    r = confident_learning_noise(df).collect()[0]
    assert (r["n"], r["n_confident"]) == (5, 4)
    assert r["t_pos"] == pytest.approx(19 / 30, abs=1e-9)
    assert r["t_neg"] == pytest.approx(0.8, abs=1e-12)
    assert (r["c00"], r["c01"], r["c10"], r["c11"]) == (1, 0, 1, 2)
    assert r["noise_rate"] == pytest.approx(0.25, abs=1e-12)
