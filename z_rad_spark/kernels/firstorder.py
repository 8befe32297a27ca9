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


def _pct_sorted(xs: np.ndarray, q: float) -> float:
    """np.percentile('linear') on an already-sorted array — including
    NumPy's exact lerp convention (b-(b-a)*(1-t) when t >= 0.5), so values
    are bit-identical to np.percentile. One shared sort replaces the
    re-sort inside every percentile call (the kernel hot spot)."""
    h = (xs.size - 1) * (q / 100.0)
    lo = int(h)
    t = h - lo
    a = xs[lo]
    if t == 0.0:
        return float(a)
    b = xs[lo + 1]
    if t >= 0.5:
        return float(b - (b - a) * (1 - t))
    return float(a + (b - a) * t)


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
    (zrad/radiomics/intensity.py:218-252). All order statistics come from
    ONE sort (np.percentile semantics preserved via _pct_sorted).
    """
    x = masked[~np.isnan(masked)]
    if x.size == 0:
        return {k: np.nan for k in STATS_NAMES}
    xs = np.sort(x)
    n = xs.size
    mean = float(xs.mean())
    d = xs - mean
    v2 = float(np.mean(d * d))
    p10 = _pct_sorted(xs, 10)
    p25 = _pct_sorted(xs, 25)
    med = _pct_sorted(xs, 50)
    p75 = _pct_sorted(xs, 75)
    p90 = _pct_sorted(xs, 90)
    trimmed = xs[int(np.searchsorted(xs, p10, "left")): int(np.searchsorted(xs, p90, "right"))]
    energy = float(np.sum(xs * xs))
    return {
        "stat_mean": mean,
        "stat_var": v2,
        "stat_skew": 0.0 if v2 == 0 else float(np.mean(d**3) / v2**1.5),
        "stat_kurt": 0.0 if v2 == 0 else float(np.mean(d**4) / v2**2 - 3),
        "stat_median": med,
        "stat_min": float(xs[0]),
        "stat_p10": p10,
        "stat_p90": p90,
        "stat_max": float(xs[-1]),
        "stat_iqr": float(p75 - p25),
        "stat_range": float(xs[-1] - xs[0]),
        "stat_mad": float(np.mean(np.abs(d))),
        "stat_rmad": float(np.mean(np.abs(trimmed - np.mean(trimmed)))),
        "stat_medad": float(np.mean(np.abs(xs - med))),
        "stat_cov": SENTINEL if mean == 0 else float(np.sqrt(v2) / mean),
        "stat_qcod": SENTINEL if p75 + p25 == 0 else float((p75 - p25) / (p75 + p25)),
        "stat_energy": energy,
        "stat_rms": float(np.sqrt(energy / n)),
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
    xs = np.sort(x)
    # run-length on the shared sorted array == np.unique(return_counts)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(xs)) + 1))
    values = xs[starts]
    counts = np.diff(np.concatenate((starts, [xs.size])))
    p = counts / counts.sum()
    mean = float(xs.mean())
    d = xs - mean
    v2 = float(np.mean(d * d))
    p10 = _pct_sorted(xs, 10)
    p25 = _pct_sorted(xs, 25)
    med = _pct_sorted(xs, 50)
    p75 = _pct_sorted(xs, 75)
    p90 = _pct_sorted(xs, 90)
    trimmed = xs[int(np.searchsorted(xs, p10, "left")): int(np.searchsorted(xs, p90, "right"))]
    out = {
        "ih_mean": mean,
        "ih_var": v2,
        "ih_skew": 0.0 if v2 == 0 else float(np.mean(d**3) / v2**1.5),
        "ih_kurt": 0.0 if v2 == 0 else float(np.mean(d**4) / v2**2 - 3),
        "ih_median": med,
        "ih_min": float(xs[0]),
        "ih_p10": p10,
        "ih_p90": p90,
        "ih_max": float(xs[-1]),
        "ih_mode": float(values[np.argmax(counts)]),
        "ih_iqr": float(p75 - p25),
        "ih_range": float(xs[-1] - xs[0]),
        "ih_mad": float(np.mean(np.abs(d))),
        "ih_rmad": float(np.mean(np.abs(trimmed - np.mean(trimmed)))),
        "ih_medad": float(np.mean(np.abs(xs - med))),
        "ih_cov": SENTINEL if mean == 0 else float(np.sqrt(v2) / mean),
        "ih_qcod": SENTINEL if p75 + p25 == 0 else float((p75 - p25) / (p75 + p25)),
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
