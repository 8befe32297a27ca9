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


def _trim_bounds(xs: np.ndarray) -> tuple[float, float]:
    """[p10, p90] trim membership in RANK space: the data-value bounds
    equivalent to comparing against the exact-real lerp percentile. Using
    order-statistic bounds (never the float lerp value) makes trim
    membership identical across NumPy / Spark / DuckDB — the computed
    lerp can round onto a data value and flip membership by one row,
    which moves the trimmed mean far beyond the 6dp rounding the driver
    hashes (reference semantics: intensity.py:132-137)."""
    n = xs.size
    h10 = (n - 1) * 0.1
    j10 = int(h10)
    t10 = h10 - j10
    a10 = float(xs[j10])
    if t10 == 0.0 or float(xs[j10 + 1]) <= a10:
        lo_b = a10
    else:
        lo_b = float(xs[j10 + 1])
    h90 = (n - 1) * 0.9
    hi_b = float(xs[int(h90)])
    return lo_b, hi_b


def _det_stats(xs: np.ndarray) -> dict:
    """Order-independent "value algebra" for the 18 first-order
    statistics, shared bit-for-bit with the SQL oracles and the
    declarative plans: every statistic is ONE fixed expression tree over
    exact aggregates (sums of integer-valued signals are exact in
    float64; order statistics are data values), so NumPy, Spark and
    DuckDB produce identical doubles regardless of row order,
    partitioning or thread count. This is what the driver's 6dp-rounded
    value hash requires: dyadic results like 279/128 = 2.1796875 sit
    exactly on a rounding boundary, where a 1-ulp Welford-vs-two-pass
    difference flips the 6th decimal.

    ``xs`` must be sorted ascending, non-empty, NaN-free.
    Reference formulas: zrad/radiomics/intensity.py:218-252.
    """
    n = xs.size
    x2 = xs * xs
    s1 = float(np.sum(xs))
    s2 = float(np.sum(x2))
    s3 = float(np.sum(x2 * xs))
    s4 = float(np.sum(x2 * x2))
    mean = s1 / n
    var = max(s2 / n - mean * mean, 0.0)
    p10 = _pct_sorted(xs, 10)
    p25 = _pct_sorted(xs, 25)
    med = _pct_sorted(xs, 50)
    p75 = _pct_sorted(xs, 75)
    p90 = _pct_sorted(xs, 90)
    lo_b, hi_b = _trim_bounds(xs)
    trimmed = xs[int(np.searchsorted(xs, lo_b, "left")): int(np.searchsorted(xs, hi_b, "right"))]
    m = trimmed.size
    st = float(np.sum(trimmed))
    # scaled-integer deviations: |n*x - S| = n*|x - S/n| with EXACT terms
    # for integer x (n*x and S are exact ints), so the sums are exact too
    sad1 = float(np.sum(np.abs(n * xs - s1)))
    sadmed = float(np.sum(np.abs(xs - med)))
    sadt = float(np.sum(np.abs(m * trimmed - st)))
    if var == 0:
        skew = 0.0
        kurt = 0.0
    else:
        skew = (s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean) / (var * np.sqrt(var))
        kurt = (
            s4 / n - 4.0 * mean * (s3 / n) + 6.0 * (mean * mean) * (s2 / n)
            - 3.0 * ((mean * mean) * (mean * mean))
        ) / (var * var) - 3.0
    return {
        "n": n,
        "mean": mean,
        "var": var,
        "skew": float(skew),
        "kurt": float(kurt),
        "median": med,
        "min": float(xs[0]),
        "p10": p10,
        "p25": p25,
        "p75": p75,
        "p90": p90,
        "max": float(xs[-1]),
        "iqr": float(p75 - p25),
        "range": float(xs[-1] - xs[0]),
        "mad": sad1 / (n * n),
        "rmad": sadt / (m * m),
        "medad": sadmed / n,
        "cov": SENTINEL if mean == 0 else float(np.sqrt(var) / mean),
        "qcod": SENTINEL if p75 + p25 == 0 else float((p75 - p25) / (p75 + p25)),
        "energy": s2,
        "rms": float(np.sqrt(s2 / n)),
    }


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
    d = _det_stats(np.sort(x))
    return {
        "stat_mean": d["mean"],
        "stat_var": d["var"],
        "stat_skew": d["skew"],
        "stat_kurt": d["kurt"],
        "stat_median": d["median"],
        "stat_min": d["min"],
        "stat_p10": d["p10"],
        "stat_p90": d["p90"],
        "stat_max": d["max"],
        "stat_iqr": d["iqr"],
        "stat_range": d["range"],
        "stat_mad": d["mad"],
        "stat_rmad": d["rmad"],
        "stat_medad": d["medad"],
        "stat_cov": d["cov"],
        "stat_qcod": d["qcod"],
        "stat_energy": d["energy"],
        "stat_rms": d["rms"],
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
    n = xs.size
    d = _det_stats(xs)
    out = {
        "ih_mean": d["mean"],
        "ih_var": d["var"],
        "ih_skew": d["skew"],
        "ih_kurt": d["kurt"],
        "ih_median": d["median"],
        "ih_min": d["min"],
        "ih_p10": d["p10"],
        "ih_p90": d["p90"],
        "ih_max": d["max"],
        "ih_mode": float(values[np.argmax(counts)]),
        "ih_iqr": d["iqr"],
        "ih_range": d["range"],
        "ih_mad": d["mad"],
        "ih_rmad": d["rmad"],
        "ih_medad": d["medad"],
        "ih_cov": d["cov"],
        "ih_qcod": d["qcod"],
        "ih_entropy": float(-np.sum(p * np.log2(p))),
        # exact form sum(c^2)/n^2 — counts are ints, so both the sum and
        # the one division are bit-identical to the SQL SUM(c*c)/(n*n)
        "ih_uniformity": float(np.sum(counts * counts)) / (n * n),
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
