"""First-order feature kernels (1-D temporal).

Faithful re-expressions of Z-Rad's first-order families over the
per-conversation signal vector:

* stats  — 18 features, zrad/radiomics/intensity.py:218-252
* hist   — 23 features, zrad/radiomics/intensity.py:284-324
* ivh    — 6 features,  zrad/radiomics/intensity.py:374-428
* local  — 2 features,  zrad/radiomics/intensity.py:48-77 (sphere -> rolling
  window of +-radius turns)

Conventions that are contractual for allclose parity with the reference:
biased (population) moments, linear-interpolation percentiles, and the
1e6 sentinel for zero denominators in CoV / QCoD.
"""

from __future__ import annotations

import numpy as np

SENTINEL = 1_000_000.0

STATS_NAMES = (
    "stat_mean",
    "stat_var",
    "stat_skew",
    "stat_kurt",
    "stat_median",
    "stat_min",
    "stat_p10",
    "stat_p90",
    "stat_max",
    "stat_iqr",
    "stat_range",
    "stat_mad",
    "stat_rmad",
    "stat_medad",
    "stat_cov",
    "stat_qcod",
    "stat_energy",
    "stat_rms",
)

HIST_NAMES = (
    "ih_mean",
    "ih_var",
    "ih_skew",
    "ih_kurt",
    "ih_median",
    "ih_min",
    "ih_p10",
    "ih_p90",
    "ih_max",
    "ih_mode",
    "ih_iqr",
    "ih_range",
    "ih_mad",
    "ih_rmad",
    "ih_medad",
    "ih_cov",
    "ih_qcod",
    "ih_entropy",
    "ih_uniformity",
    "ih_max_grad",
    "ih_max_grad_g",
    "ih_min_grad",
    "ih_min_grad_g",
)

IVH_NAMES = (
    "ivh_v10",
    "ivh_v90",
    "ivh_i10",
    "ivh_i90",
    "ivh_diff_v10_v90",
    "ivh_diff_i10_i90",
)

LOCAL_NAMES = ("loc_peak_loc", "loc_peak_glob")


def _skewness(x: np.ndarray) -> float:
    """Biased skewness (reference: intensity.py:110-118)."""
    mu = np.mean(x)
    d = x - mu
    v2 = np.mean(d**2)
    if v2 == 0:
        return 0.0
    return float(np.mean(d**3) / v2**1.5)


def _kurtosis(x: np.ndarray) -> float:
    """Biased excess kurtosis (reference: intensity.py:121-129)."""
    mu = np.mean(x)
    d = x - mu
    v2 = np.mean(d**2)
    if v2 == 0:
        return 0.0
    return float(np.mean(d**4) / v2**2 - 3)


def _rmad(x: np.ndarray) -> float:
    """Mean abs deviation on the [p10, p90]-trimmed values
    (reference: intensity.py:132-137)."""
    p10 = np.percentile(x, 10)
    p90 = np.percentile(x, 90)
    t = x[(x >= p10) & (x <= p90)]
    return float(np.mean(np.abs(t - np.mean(t))))


def _cov(x: np.ndarray) -> float:
    mu = np.mean(x)
    if mu == 0:
        return SENTINEL
    return float(np.std(x) / mu)


def _qcod(x: np.ndarray) -> float:
    p25 = np.percentile(x, 25)
    p75 = np.percentile(x, 75)
    if p75 + p25 == 0:
        return SENTINEL
    return float((p75 - p25) / (p75 + p25))


def stats_features(masked: np.ndarray) -> dict:
    """18 first-order statistics on the valid (non-NaN) signal values.

    Reference: IntensityStatisticsFeatures.calculate_features
    (zrad/radiomics/intensity.py:218-252).
    """
    x = masked[~np.isnan(masked)]
    if x.size == 0:
        return {k: np.nan for k in STATS_NAMES}
    return {
        "stat_mean": float(np.mean(x)),
        "stat_var": float(np.std(x) ** 2),
        "stat_skew": _skewness(x),
        "stat_kurt": _kurtosis(x),
        "stat_median": float(np.median(x)),
        "stat_min": float(np.min(x)),
        "stat_p10": float(np.percentile(x, 10)),
        "stat_p90": float(np.percentile(x, 90)),
        "stat_max": float(np.max(x)),
        "stat_iqr": float(np.percentile(x, 75) - np.percentile(x, 25)),
        "stat_range": float(np.max(x) - np.min(x)),
        "stat_mad": float(np.mean(np.abs(x - np.mean(x)))),
        "stat_rmad": _rmad(x),
        "stat_medad": float(np.mean(np.abs(x - np.median(x)))),
        "stat_cov": _cov(x),
        "stat_qcod": _qcod(x),
        "stat_energy": float(np.sum(x**2)),
        "stat_rms": float(np.sqrt(np.mean(x**2))),
    }


def hist_features(grey: np.ndarray) -> dict:
    """23 histogram features on discretized grey levels.

    Reference: IntensityHistogramFeatures.calculate_features
    (zrad/radiomics/intensity.py:284-324); gradient over per-level counts via
    np.gradient (intensity.py:179-185) requires >= 2 distinct levels.
    """
    x = grey[~np.isnan(grey)]
    if x.size == 0:
        return {k: np.nan for k in HIST_NAMES}
    values, counts = np.unique(x, return_counts=True)
    p = counts / counts.sum()
    out = {
        "ih_mean": float(np.mean(x)),
        "ih_var": float(np.std(x) ** 2),
        "ih_skew": _skewness(x),
        "ih_kurt": _kurtosis(x),
        "ih_median": float(np.median(x)),
        "ih_min": float(np.min(x)),
        "ih_p10": float(np.percentile(x, 10)),
        "ih_p90": float(np.percentile(x, 90)),
        "ih_max": float(np.max(x)),
        "ih_mode": float(values[np.argmax(counts)]),
        "ih_iqr": float(np.percentile(x, 75) - np.percentile(x, 25)),
        "ih_range": float(np.max(x) - np.min(x)),
        "ih_mad": float(np.mean(np.abs(x - np.mean(x)))),
        "ih_rmad": _rmad(x),
        "ih_medad": float(np.mean(np.abs(x - np.median(x)))),
        "ih_cov": _cov(x),
        "ih_qcod": _qcod(x),
        "ih_entropy": float(-np.sum(p * np.log2(p))),
        "ih_uniformity": float(np.sum(p * p)),
    }
    if len(counts) > 1:
        grad = np.gradient(counts.astype(float))
        out["ih_max_grad"] = float(np.max(grad))
        out["ih_max_grad_g"] = float(values[np.argmax(grad)])
        out["ih_min_grad"] = float(np.min(grad))
        out["ih_min_grad_g"] = float(values[np.argmin(grad)])
    else:
        out["ih_max_grad"] = np.nan
        out["ih_max_grad_g"] = np.nan
        out["ih_min_grad"] = np.nan
        out["ih_min_grad_g"] = np.nan
    return out


def ivh_features(ivh_arr: np.ndarray, lo: float, hi: float, step: float) -> dict:
    """6 intensity-volume-histogram features.

    Reference: IntensityVolumeHistogramFeatures (intensity.py:374-428):
    thresholds arange(lo, hi+step, step); fractional volume
    1 - (#values < t)/n; V_x = max fractional volume where intensity
    fraction > x%; I_x = min threshold with fractional volume <= x%.
    The sweep is one vectorized searchsorted over the sorted values.
    """
    x = ivh_arr[~np.isnan(ivh_arr)]
    if x.size == 0 or hi == lo:
        return {k: np.nan for k in IVH_NAMES}
    thresholds = np.arange(lo, hi + step, step)
    xs = np.sort(x)
    below = np.searchsorted(xs, thresholds, side="left")
    frac_vol = 1.0 - below / x.size
    int_frac = (thresholds - lo) / (hi - lo)

    def v_at(xpct):
        sel = frac_vol[int_frac > xpct / 100]
        return float(np.max(sel)) if sel.size else np.nan

    def i_at(xpct):
        sel = thresholds[frac_vol <= xpct / 100]
        return float(np.min(sel)) if sel.size else np.nan

    v10, v90 = v_at(10), v_at(90)
    i10, i90 = i_at(10), i_at(90)
    return {
        "ivh_v10": v10,
        "ivh_v90": v90,
        "ivh_i10": i10,
        "ivh_i90": i90,
        "ivh_diff_v10_v90": v10 - v90,
        "ivh_diff_i10_i90": i10 - i90,
    }


def _rolling_mean(full: np.ndarray, radius: int) -> np.ndarray:
    """Centered rolling mean with zero-padding outside the sequence —
    the 1-D analogue of the spherical-kernel convolve with mode='constant'
    (reference: intensity.py:74-75). Window size is fixed (2r+1) like the
    reference's fixed sphere volume n_s."""
    n = full.size
    k = 2 * radius + 1
    padded = np.concatenate([np.zeros(radius), np.nan_to_num(full, nan=0.0), np.zeros(radius)])
    c = np.cumsum(np.concatenate([[0.0], padded]))
    return (c[k:] - c[:-k]) / k


def local_features(full: np.ndarray, masked: np.ndarray, radius: int) -> dict:
    """Local & global intensity peaks.

    Reference: LocalIntensityFeatures (intensity.py:48-77). local peak = max
    over max-signal eligible turns of the mean signal within +-radius turns
    (the reference averages the *full* image inside the sphere, including
    turns outside the ROI); global peak = max rolling mean over eligible
    turns.
    """
    valid = ~np.isnan(masked)
    if not valid.any():
        return {k: np.nan for k in LOCAL_NAMES}
    roll = _rolling_mean(full, radius)
    mx = np.nanmax(masked)
    at_max = valid & (masked == mx)
    return {
        "loc_peak_loc": float(np.max(roll[at_max])),
        "loc_peak_glob": float(np.max(roll[valid])),
    }
