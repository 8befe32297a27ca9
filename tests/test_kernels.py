"""Kernel <-> oracle parity on synthetic 1-D arrays (no Spark).

Mirrors the reference's tiny-synthetic-array unit tests
(tests/test_radiomics.py:16-23 builds 3x3x3 images by hand); here the
oracle is an independent loop-based implementation (oracle/reference.py).
"""

import math

import numpy as np
import pytest

from oracle import reference as orc
from z_rad_spark.kernels import firstorder as fo
from z_rad_spark.kernels import prep, texture


def _rand_signal(n=200, nan_frac=0.2, lvl=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(1, lvl + 1, size=n).astype(float)
    x[rng.random(n) < nan_frac] = np.nan
    return x


def _rand_sessions(n, seed=1, n_sess=4):
    rng = np.random.default_rng(seed)
    brk = np.sort(rng.choice(np.arange(1, n), size=n_sess - 1, replace=False))
    sess = np.zeros(n, dtype=np.int64)
    for b in brk:
        sess[b:] += 1
    return sess


def _close(a, b, name=""):
    if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
        return
    assert a == pytest.approx(b, rel=1e-9, abs=1e-12), name


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stats_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(10, 3, size=300)
    x[rng.random(300) < 0.1] = np.nan
    got = fo.stats_features(x)
    want = orc.stats_oracle(list(x))
    for k, v in want.items():
        _close(got[k], v, k)


@pytest.mark.parametrize("seed", [0, 3])
def test_hist_vs_oracle(seed):
    g = _rand_signal(seed=seed)
    got = fo.hist_features(g)
    want = orc.hist_oracle(list(g))
    for k, v in want.items():
        _close(got[k], v, k)


def test_hist_single_level_gradient_nan():
    g = np.array([2.0, 2.0, np.nan, 2.0])
    got = fo.hist_features(g)
    assert math.isnan(got["ih_max_grad"])


@pytest.mark.parametrize("method,kw", [("direct", {}), ("fixed_bin_number", {"n_bins": 8}), ("fixed_bin_size", {"bin_size": 2.0})])
def test_ivh_vs_oracle(method, kw):
    rng = np.random.default_rng(5)
    x = rng.normal(20, 5, size=400)
    x[rng.random(400) < 0.15] = np.nan
    arr, lo, hi, step = prep.ivh_prepare(x, method, n_bins=kw.get("n_bins"), bin_size=kw.get("bin_size"))
    got = fo.ivh_features(arr, lo, hi, step)
    want = orc.ivh_oracle(list(arr), lo, hi, step)
    for k, v in want.items():
        _close(got[k], v, k)


def test_discretizers_vs_oracle():
    rng = np.random.default_rng(9)
    x = rng.normal(5, 2, size=100)
    x[rng.random(100) < 0.2] = np.nan
    np.testing.assert_allclose(
        prep.discretize_fbs(x, 0.7), np.array(orc.fbs_oracle(list(x), 0.7)), equal_nan=True
    )
    np.testing.assert_allclose(
        prep.discretize_fbn(x, 12), np.array(orc.fbn_oracle(list(x), 12)), equal_nan=True
    )
    # FBN max maps to N, degenerate range maps to 1
    valid = x[~np.isnan(x)]
    g = prep.discretize_fbn(x, 12)
    assert g[np.nanargmax(x)] == 12
    const = np.where(np.isnan(x), np.nan, 3.0)
    np.testing.assert_allclose(prep.discretize_fbn(const, 5)[~np.isnan(x)], 1.0)
    assert valid.size > 0


def test_sessionize_vs_oracle():
    rng = np.random.default_rng(2)
    gaps = rng.exponential(100e6, size=50).astype(np.int64)
    ts = np.cumsum(gaps)
    got = prep.sessionize(ts, 120.0)
    want = orc.sessionize_oracle(list(ts), 120.0)
    np.testing.assert_array_equal(got, np.array(want))


def test_border_distance_vs_oracle():
    rng = np.random.default_rng(4)
    n = 120
    elig = rng.random(n) > 0.25
    sess = _rand_sessions(n, seed=7)
    got = prep.border_distance(elig, sess)
    want = orc.border_distance_oracle(list(elig), list(sess))
    np.testing.assert_array_equal(got, np.array(want))


@pytest.mark.parametrize("lag", [1, 2, 3])
def test_glcm_matrix_and_features_vs_oracle(lag):
    g = _rand_signal(n=150, seed=lag)
    lvl = int(np.nanmax(g)) + 1
    got_m = texture.glcm_count_matrix(g, lag, lvl)
    want_m = np.array(orc.glcm_matrix_oracle(list(g), lag))
    np.testing.assert_allclose(got_m, want_m)
    got = texture.glcm_feature_values(got_m)
    want = orc.glcm_features_oracle([list(r) for r in want_m])
    for k, v in want.items():
        _close(got[k], v, k)


def test_runs_vs_oracle():
    g = _rand_signal(n=100, lvl=3, seed=11)
    sess = _rand_sessions(100, seed=12)
    levels, lengths, starts, ends = texture.find_runs(g, sess)
    want = orc.runs_oracle(list(g), list(sess))
    assert list(zip(levels, lengths, starts, ends)) == want


def test_matrix_feature_values_vs_oracle():
    rng = np.random.default_rng(13)
    m = rng.integers(0, 5, size=(7, 9)).astype(float)
    got = texture.matrix_feature_values(m, 60.0, include_energy=True)
    want = orc.texture_matrix_features_oracle([list(r) for r in m], 60.0, include_energy=True)
    for k, v in want.items():
        _close(got[k], v, k)


def test_ngtdm_vs_oracle():
    g = _rand_signal(n=140, lvl=5, seed=21)
    lvl = int(np.nanmax(g)) + 1
    got_m = texture.ngtdm_matrix(g, lvl)
    want_m = np.array(orc.ngtdm_oracle(list(g), lvl))
    np.testing.assert_allclose(got_m, want_m)
    got = texture.ngtdm_feature_values(got_m)
    want = orc.ngtdm_features_oracle([list(r) for r in want_m])
    for k, v in want.items():
        _close(got[k], v, k)


def test_ngldm_vs_oracle():
    g = _rand_signal(n=140, lvl=4, seed=22)
    lvl = int(np.nanmax(g)) + 1
    got_m = texture.ngldm_matrix(g, lvl)
    want_m = np.array(orc.ngldm_oracle(list(g), lvl))
    np.testing.assert_allclose(got_m, want_m)


def test_resegment_order_contract():
    # outlier stats must be computed AFTER range reseg
    # (resegmentation.py:230-231)
    raw = np.array([1.0, 2.0, 3.0, 100.0, 2.5, 2.0, np.nan, 2.2])
    masked = raw.copy()
    out = prep.resegment(masked, raw, (0.0, 10.0), 1.0)
    # with 100 removed first, the remaining population is tight around ~2.1
    kept = out[~np.isnan(out)]
    assert 100.0 not in kept
    assert kept.size >= 4


def test_glcm_aggregations_consistency():
    """MERG vs AVER must differ in general; 2.5D MERG equals summing all."""
    g = _rand_signal(n=200, lvl=4, seed=30)
    sess = _rand_sessions(200, seed=31)
    merg = texture.glcm_features(g, sess, None, (1, 2), False, False, "2.5D", "MERG")
    aver = texture.glcm_features(g, sess, None, (1, 2), False, False, "2D", "AVER")
    assert merg["cm_joint_entr"] != pytest.approx(aver["cm_joint_entr"])
    # 3D MERG with lag set == manual merge
    lvl = int(np.nanmax(g)) + 1
    m = sum(texture.glcm_count_matrix(g, k, lvl) for k in (1, 2))
    want = texture.glcm_feature_values(m)
    got = texture.glcm_features(g, sess, None, (1, 2), False, False, "3D", "MERG")
    for k in want:
        _close(got[k], want[k], k)
