"""Filter kernels: brute-force convolution parity, declarative/window
equivalence, and filtered-extraction leakage safety."""

import math

import numpy as np
import pandas as pd
import pytest

from z_rad_spark.kernels import filters as flt


def _brute_conv(x, k):
    """Independent O(n*m) zero-padded centered correlation."""
    n, m = len(x), len(k)
    lpad = m // 2
    out = []
    for i in range(n):
        acc = 0.0
        for j in range(m):
            p = i + j - lpad
            if 0 <= p < n and not math.isnan(x[p]):
                acc += x[p] * k[j]
        out.append(acc)
    return np.array(out)


@pytest.mark.parametrize("name,kw", [
    ("mean", {"support": 5}),
    ("log", {"sigma": 1.5}),
    ("laws", {"kernel": "E5", "invariance": "avg"}),
    ("laws", {"kernel": "S5", "invariance": "max", "energy_support": 3}),
    ("gabor", {"sigma": 2.0, "wavelength": 4.0}),
    ("wavelet", {"wavelet": "haar", "band": "H"}),
    ("wavelet", {"wavelet": "db2", "band": "L", "level": 2}),
])
def test_filter_shapes_and_determinism(name, kw):
    rng = np.random.default_rng(7)
    x = rng.normal(5, 2, size=80)
    a = flt.apply_filter(x, name, **kw)
    b = flt.apply_filter(x, name, **kw)
    assert a.shape == x.shape
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_mean_filter_vs_brute():
    rng = np.random.default_rng(8)
    x = rng.normal(0, 1, size=60)
    got = flt.mean_filter(x, 5)
    want = _brute_conv(list(x), list(np.ones(5) / 5))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_laws_filter_vs_brute():
    rng = np.random.default_rng(9)
    x = rng.normal(0, 1, size=60)
    k = flt.LAWS_KERNELS["E5"]
    fwd = _brute_conv(list(x), list(k))
    rev = _brute_conv(list(x), list(k[::-1]))
    np.testing.assert_allclose(flt.laws_filter(x, "E5", "avg"), (fwd + rev) / 2, atol=1e-12)
    np.testing.assert_allclose(flt.laws_filter(x, "E5", "max"), np.maximum(fwd, rev), atol=1e-12)


def test_gabor_magnitude_vs_brute():
    rng = np.random.default_rng(10)
    x = rng.normal(0, 1, size=50)
    sigma, wl = 2.0, 4.0
    r = int(np.ceil(3.0 * sigma))
    t = np.arange(-r, r + 1, dtype=float)
    env = np.exp(-(t**2) / (2 * sigma**2))
    re = _brute_conv(list(x), list(env * np.cos(2 * np.pi * t / wl)))
    im = _brute_conv(list(x), list(env * np.sin(2 * np.pi * t / wl)))
    np.testing.assert_allclose(flt.gabor_filter(x, sigma, wl), np.hypot(re, im), atol=1e-12)


def test_log_filter_zero_sum_response_on_constant():
    x = np.full(50, 7.0)
    out = flt.log_filter(x, sigma=1.5)
    # interior of a constant signal must respond ~0 (zero-sum kernel)
    assert np.abs(out[10:-10]).max() < 1e-10


def test_declarative_mean_matches_kernel(spark):
    from z_rad_spark.operators.filtering import with_mean_filter
    from z_rad_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts_pdf, with_signal

    pdf = synth_transcripts_pdf(n_convs=3, mean_turns=25, seed=14)
    df = with_signal(spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA))
    got = (
        with_mean_filter(df, support=5)
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    )
    for conv, grp in got.groupby("conv_id"):
        want = flt.mean_filter(grp["signal"].to_numpy(dtype=float), 5)
        np.testing.assert_allclose(grp["signal_filt"].to_numpy(), want, atol=1e-9)


@pytest.mark.parametrize("op,kernel_fn", [
    ("log", lambda x: flt.log_filter(x, sigma=1.5)),
    ("laws", lambda x: flt.laws_filter(x, "S5", "avg", energy_support=5)),
    ("gabor", lambda x: flt.gabor_filter(x, 2.0, 4.0)),
    ("wavelet", lambda x: flt.wavelet_filter(x, "db2", "H", 1, "avg")),
])
def test_declarative_filters_match_kernel(spark, op, kernel_fn):
    """The window-expression path and the grouped-map kernel path share
    taps, so they must be value-identical per conversation."""
    from z_rad_spark.operators import filtering as fop
    from z_rad_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts_pdf, with_signal

    builders = {
        "log": lambda df: fop.with_log_filter(df, sigma=1.5),
        "laws": lambda df: fop.with_laws_filter(df, "S5", "avg", energy_support=5),
        "gabor": lambda df: fop.with_gabor_filter(df, 2.0, 4.0),
        "wavelet": lambda df: fop.with_wavelet_filter(df, "db2", "H", 1, "avg"),
    }
    pdf = synth_transcripts_pdf(n_convs=3, mean_turns=25, seed=21)
    df = with_signal(spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA))
    got = (
        builders[op](df)
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    )
    for conv, grp in got.groupby("conv_id"):
        want = kernel_fn(grp["signal"].to_numpy(dtype=float))
        np.testing.assert_allclose(grp["signal_filt"].to_numpy(), want, atol=1e-9)


def test_filtered_extraction_no_leakage(spark):
    """The filter window must not read post-cutoff turns: poisoning them
    leaves filtered features identical (filter runs on the cutoff slice)."""
    from z_rad_spark.config import FeatureConfig
    from z_rad_spark.extractor import extract_features
    from z_rad_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts_pdf

    pdf = synth_transcripts_pdf(n_convs=4, mean_turns=30, seed=15)
    cut = "2024-01-02T00:00:00"
    cfg = FeatureConfig(
        families=("stats",), filter_name="log", filter_params=(("sigma", 1.5),), min_turns=2
    )

    def run(frame):
        df = spark.createDataFrame(frame, schema=TRANSCRIPT_SCHEMA)
        return (
            extract_features(df, cfg, [cut])
            .toPandas()
            .sort_values(["conv_id"])
            .reset_index(drop=True)
        )

    base = run(pdf)
    poisoned = pdf.copy()
    after = poisoned["ts"] > np.datetime64(cut)
    assert after.any()
    poisoned.loc[after, "text"] = "x " * 300
    got = run(poisoned)
    pd.testing.assert_frame_equal(base, got, check_exact=True)


def test_wavelet_bank_families_valid():
    """Every built-in bank satisfies the wavelet filter conditions
    (sum lo = sqrt(2), sum hi = 0, unit energy) and the QMF-derived db2
    high-pass equals the published pywt dec_hi exactly; unknown names
    fail with a clear error (pywt pass-through is import-gated)."""
    import numpy as np
    import pytest

    from z_rad_spark.kernels.filters import WAVELET_DEC_LO, wavelet_bank

    for name in WAVELET_DEC_LO:
        lo, hi = wavelet_bank(name)
        assert abs(lo.sum() - np.sqrt(2)) < 1e-10, name
        assert abs(hi.sum()) < 1e-10, name
        assert abs((lo * lo).sum() - 1.0) < 1e-10, name
        assert abs((hi * hi).sum() - 1.0) < 1e-10, name
    lo, hi = wavelet_bank("db2")
    assert np.array_equal(
        hi,
        np.array([-0.48296291314469025, 0.836516303737469,
                  -0.22414386804185735, -0.12940952255092145]),
    )
    with pytest.raises(ValueError, match="unknown wavelet"):
        wavelet_bank("not_a_wavelet")


def test_wavelet_filter_new_families_run():
    """db3/db4/sym4/coif1 taps drive both the kernel and the declarative
    window path, and the two agree."""
    import numpy as np

    from z_rad_spark.kernels import filters as flt

    x = np.arange(40, dtype=float) % 7
    for name in ("db3", "db4", "sym4", "coif1"):
        for band in ("L", "H"):
            out = flt.wavelet_filter(x, name, band, level=1, invariance="avg")
            assert out.shape == x.shape
            assert np.isfinite(out).all()
            taps = flt.wavelet_taps(name, band, 1, "avg")
            brute = flt._conv_same_zero(x, taps)
            np.testing.assert_allclose(out, brute, rtol=0, atol=1e-12)
