"""Single-node reference implementation (the engine's "IBSI oracle").

Plays the role the IBSI reference-value CSVs play in the reference repo
(tests/test_ibsi_1.py:19-41): an INDEPENDENT implementation of every
feature formula, written as plain per-element Python loops over pandas
rows — deliberately a different code path from the engine's vectorized
kernels — whose outputs the Spark engine must match allclose.

Formulas transcribed from /root/reference (cited per function in the
engine kernels; this module re-derives them naively).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _valid(xs):
    return [v for v in xs if not (isinstance(v, float) and math.isnan(v))]


def _percentile(xs, q):
    return float(np.percentile(np.array(xs, dtype=float), q))


def stats_oracle(values) -> dict:
    x = _valid(values)
    n = len(x)
    if n == 0:
        return {}
    mean = sum(x) / n
    var = sum((v - mean) ** 2 for v in x) / n
    std = math.sqrt(var)
    m3 = sum((v - mean) ** 3 for v in x) / n
    m4 = sum((v - mean) ** 4 for v in x) / n
    med = _percentile(x, 50)
    p10, p25, p75, p90 = (_percentile(x, q) for q in (10, 25, 75, 90))
    trimmed = [v for v in x if p10 <= v <= p90]
    tmean = sum(trimmed) / len(trimmed)
    return {
        "stat_mean": mean,
        "stat_var": var,
        "stat_skew": 0.0 if var == 0 else m3 / var**1.5,
        "stat_kurt": 0.0 if var == 0 else m4 / var**2 - 3,
        "stat_median": med,
        "stat_min": min(x),
        "stat_p10": p10,
        "stat_p90": p90,
        "stat_max": max(x),
        "stat_iqr": p75 - p25,
        "stat_range": max(x) - min(x),
        "stat_mad": sum(abs(v - mean) for v in x) / n,
        "stat_rmad": sum(abs(v - tmean) for v in trimmed) / len(trimmed),
        "stat_medad": sum(abs(v - med) for v in x) / n,
        "stat_cov": 1_000_000.0 if mean == 0 else std / mean,
        "stat_qcod": 1_000_000.0 if p75 + p25 == 0 else (p75 - p25) / (p75 + p25),
        "stat_energy": sum(v * v for v in x),
        "stat_rms": math.sqrt(sum(v * v for v in x) / n),
    }


def hist_oracle(grey) -> dict:
    x = _valid(grey)
    if not x:
        return {}
    counts: dict = {}
    for v in x:
        counts[v] = counts.get(v, 0) + 1
    levels = sorted(counts)
    n = len(x)
    probs = [counts[g] / n for g in levels]
    base = stats_oracle(x)
    out = {("ih_" + k.split("_", 1)[1]): v for k, v in base.items() if k not in ("stat_energy", "stat_rms")}
    out["ih_mode"] = float(levels[int(np.argmax([counts[g] for g in levels]))])
    out["ih_entropy"] = -sum(p * math.log2(p) for p in probs)
    out["ih_uniformity"] = sum(p * p for p in probs)
    if len(levels) > 1:
        c = [float(counts[g]) for g in levels]
        grad = list(np.gradient(np.array(c)))
        out["ih_max_grad"] = float(max(grad))
        out["ih_max_grad_g"] = float(levels[int(np.argmax(grad))])
        out["ih_min_grad"] = float(min(grad))
        out["ih_min_grad_g"] = float(levels[int(np.argmin(grad))])
    else:
        for k in ("ih_max_grad", "ih_max_grad_g", "ih_min_grad", "ih_min_grad_g"):
            out[k] = float("nan")
    return out


def ivh_oracle(values, lo, hi, step) -> dict:
    x = _valid(values)
    if not x or hi == lo:
        return {}
    thresholds = list(np.arange(lo, hi + step, step))
    n = len(x)
    frac_vol = [1 - sum(1 for v in x if v < t) / n for t in thresholds]
    int_frac = [(t - lo) / (hi - lo) for t in thresholds]

    def v_at(pct):
        sel = [fv for fv, f in zip(frac_vol, int_frac) if f > pct / 100]
        return max(sel) if sel else float("nan")

    def i_at(pct):
        sel = [t for t, fv in zip(thresholds, frac_vol) if fv <= pct / 100]
        return min(sel) if sel else float("nan")

    v10, v90, i10, i90 = v_at(10), v_at(90), i_at(10), i_at(90)
    return {
        "ivh_v10": v10,
        "ivh_v90": v90,
        "ivh_i10": i10,
        "ivh_i90": i90,
        "ivh_diff_v10_v90": v10 - v90,
        "ivh_diff_i10_i90": i10 - i90,
    }


def fbs_oracle(values, bin_size, minimum=None):
    x = np.array(values, dtype=float)
    anchor = np.nanmin(x) if minimum is None else minimum
    return [math.floor((v - anchor) / bin_size) + 1 if not math.isnan(v) else float("nan") for v in x]


def fbn_oracle(values, n_bins):
    x = [v for v in values if not math.isnan(v)]
    lo, hi = min(x), max(x)
    out = []
    for v in values:
        if math.isnan(v):
            out.append(float("nan"))
        elif hi == lo:
            out.append(1.0)
        elif v == hi:
            out.append(float(n_bins))
        else:
            out.append(math.floor(n_bins * (v - lo) / (hi - lo)) + 1)
    return out


def sessionize_oracle(ts_us, gap_seconds):
    sess = [0] * len(ts_us)
    for i in range(1, len(ts_us)):
        sess[i] = sess[i - 1] + (1 if (ts_us[i] - ts_us[i - 1]) > gap_seconds * 1e6 else 0)
    return sess


# ---------------------------------------------------------------------------
# texture oracles: naive dict-based matrix builds + literal formula loops
# ---------------------------------------------------------------------------


def glcm_matrix_oracle(seq, lag):
    """Naive symmetric co-occurrence counts over one sequence segment."""
    lvl = int(max(v for v in seq if not math.isnan(v))) + 1
    m = [[0.0] * lvl for _ in range(lvl)]
    for i in range(len(seq) - lag):
        a, b = seq[i], seq[i + lag]
        if not math.isnan(a) and not math.isnan(b):
            m[int(a)][int(b)] += 1
            m[int(b)][int(a)] += 1
    return m


def glcm_features_oracle(P) -> dict:
    """Literal transcription of glcm.py:211-420 using loops (P normalized)."""
    lvl = len(P)
    n_g = lvl - 1
    tot = sum(sum(r) for r in P)
    P = [[v / tot for v in r] for r in P]
    p_minus = [0.0] * lvl
    p_plus = [0.0] * (2 * lvl - 1)
    for i in range(lvl):
        for j in range(lvl):
            p_minus[abs(i - j)] += P[i][j]
            p_plus[i + j] += P[i][j]
    p_i = [sum(P[i][j] for i in range(lvl)) for j in range(lvl)]
    mu_i = sum(p * k for k, p in enumerate(p_i))
    sigma_i2 = sum((k - mu_i) ** 2 * p for k, p in enumerate(p_i))
    joint_avg = sum(P[i][j] * i for i in range(lvl) for j in range(lvl))
    diff_avg = sum(p * k for k, p in enumerate(p_minus))
    sum_avg = sum(p * k for k, p in enumerate(p_plus))
    hxy = -sum(P[i][j] * math.log2(P[i][j]) for i in range(lvl) for j in range(lvl) if P[i][j] > 0)
    hx = -sum(p * math.log2(p) for p in p_i if p > 0)
    hxy1 = -sum(
        P[i][j] * math.log2(p_i[i] * p_i[j])
        for i in range(lvl)
        for j in range(lvl)
        if p_i[i] != 0 and p_i[j] != 0
    )
    hxy2 = -sum(
        p_i[i] * p_i[j] * math.log2(p_i[i] * p_i[j])
        for i in range(lvl)
        for j in range(lvl)
        if p_i[i] != 0 and p_i[j] != 0
    )
    try:
        info2 = math.sqrt(1 - math.exp(-2 * (hxy2 - hxy)))
    except ValueError:
        info2 = float("nan")
    return {
        "cm_joint_max": max(max(r) for r in P),
        "cm_joint_avg": joint_avg,
        "cm_joint_var": sum(P[i][j] * (i - joint_avg) ** 2 for i in range(lvl) for j in range(lvl)),
        "cm_joint_entr": hxy,
        "cm_diff_avg": diff_avg,
        "cm_diff_var": sum(p * (k - diff_avg) ** 2 for k, p in enumerate(p_minus)),
        "cm_diff_entr": -sum(p * math.log2(p) for p in p_minus if p > 0),
        "cm_sum_avg": sum_avg,
        "cm_sum_var": sum(p * (k - sum_avg) ** 2 for k, p in enumerate(p_plus)),
        "cm_sum_entr": -sum(p * math.log2(p) for p in p_plus if p > 0),
        "cm_energy": sum(v * v for r in P for v in r),
        "cm_contrast": sum(P[i][j] * (i - j) ** 2 for i in range(lvl) for j in range(lvl)),
        "cm_dissimilarity": sum(P[i][j] * abs(i - j) for i in range(lvl) for j in range(lvl)),
        "cm_inv_diff": sum(P[i][j] / (1 + abs(i - j)) for i in range(lvl) for j in range(lvl)),
        "cm_inv_diff_norm": sum(P[i][j] / (1 + abs(i - j) / n_g) for i in range(lvl) for j in range(lvl))
        if n_g
        else float("nan"),
        "cm_inv_diff_mom": sum(p / (1 + k**2) for k, p in enumerate(p_minus)),
        "cm_inv_diff_mom_norm": sum(p / (1 + (k / n_g) ** 2) for k, p in enumerate(p_minus))
        if n_g
        else float("nan"),
        "cm_inv_var": sum(p / k**2 for k, p in enumerate(p_minus) if k > 0),
        "cm_corr": float("nan")
        if sigma_i2 == 0
        else (sum(P[i][j] * i * j for i in range(lvl) for j in range(lvl)) - mu_i**2) / sigma_i2,
        "cm_auto_corr": sum(P[i][j] * i * j for i in range(lvl) for j in range(lvl)),
        "cm_clust_tend": sum((i + j - 2 * mu_i) ** 2 * P[i][j] for i in range(lvl) for j in range(lvl)),
        "cm_clust_shade": sum((i + j - 2 * mu_i) ** 3 * P[i][j] for i in range(lvl) for j in range(lvl)),
        "cm_clust_prom": sum((i + j - 2 * mu_i) ** 4 * P[i][j] for i in range(lvl) for j in range(lvl)),
        "cm_info_corr1": float("nan") if hx == 0 else (hxy - hxy1) / hx,
        "cm_info_corr2": info2,
    }


def runs_oracle(seq, sess):
    """Naive run scan: (level, length, start, end) tuples."""
    runs = []
    i = 0
    n = len(seq)
    while i < n:
        if math.isnan(seq[i]):
            i += 1
            continue
        j = i
        while (
            j + 1 < n
            and not math.isnan(seq[j + 1])
            and seq[j + 1] == seq[i]
            and sess[j + 1] == sess[j]
        ):
            j += 1
        runs.append((int(seq[i]), j - i + 1, i, j))
        i = j + 1
    return runs


def texture_matrix_features_oracle(m, voxel_count, include_energy=False) -> dict:
    """Literal loop transcription of texture_base.py:80-214."""
    rows = len(m)
    cols = len(m[0]) if rows else 0
    n_s = sum(sum(r) for r in m)
    out = {}
    if n_s == 0 or voxel_count == 0:
        return out
    out["short_runs_emphasis"] = sum(m[i][j] / (j + 1) ** 2 for i in range(rows) for j in range(cols)) / n_s
    out["long_runs_emphasis"] = sum(m[i][j] * (j + 1) ** 2 for i in range(rows) for j in range(cols)) / n_s
    out["low_grey_level_run_emphasis"] = (
        sum(m[i][j] / i**2 for i in range(1, rows) for j in range(cols)) / n_s
    )
    out["high_gr_lvl_emphasis"] = sum(m[i][j] * i**2 for i in range(rows) for j in range(cols)) / n_s
    out["short_low_gr_lvl_emphasis"] = (
        sum(m[i][j] / i**2 / (j + 1) ** 2 for i in range(1, rows) for j in range(cols)) / n_s
    )
    out["short_high_gr_lvl_emphasis"] = (
        sum(m[i][j] * i**2 / (j + 1) ** 2 for i in range(rows) for j in range(cols)) / n_s
    )
    out["long_low_gr_lvl_emphasis"] = (
        sum(m[i][j] * (j + 1) ** 2 / i**2 for i in range(1, rows) for j in range(cols)) / n_s
    )
    out["long_high_gr_lvl_emphasis"] = (
        sum(m[i][j] * (j + 1) ** 2 * i**2 for i in range(rows) for j in range(cols)) / n_s
    )
    row_sums = [sum(r) for r in m]
    col_sums = [sum(m[i][j] for i in range(rows)) for j in range(cols)]
    out["non_uniformity"] = sum(r**2 for r in row_sums) / n_s
    out["norm_non_uniformity"] = sum(r**2 for r in row_sums) / n_s**2
    out["length_non_uniformity"] = sum(c**2 for c in col_sums) / n_s
    out["norm_length_non_uniformity"] = sum(c**2 for c in col_sums) / n_s**2
    out["percentage"] = n_s / voxel_count
    mu_i = sum(m[i][j] * i / n_s for i in range(rows) for j in range(cols))
    mu_j = sum(m[i][j] * j / n_s for i in range(rows) for j in range(cols))
    out["gr_lvl_var"] = sum((i - mu_i) ** 2 * m[i][j] / n_s for i in range(rows) for j in range(cols))
    out["length_var"] = sum((j - mu_j) ** 2 * m[i][j] / n_s for i in range(rows) for j in range(cols))
    out["entropy"] = -sum(
        (m[i][j] / n_s) * math.log2(m[i][j] / n_s) for i in range(rows) for j in range(cols) if m[i][j]
    )
    if include_energy:
        out["energy"] = sum((m[i][j] / n_s) ** 2 for i in range(rows) for j in range(cols) if m[i][j])
    return out


def ngtdm_oracle(seq, lvl) -> list:
    """Naive per-position neighbour scan -> [n_i, s_i] rows."""
    n = len(seq)
    m = [[0.0, 0.0] for _ in range(lvl)]
    for i in range(n):
        if math.isnan(seq[i]):
            continue
        nb = [seq[k] for k in (i - 1, i + 1) if 0 <= k < n and not math.isnan(seq[k])]
        if not nb:
            continue
        g = int(seq[i])
        m[g][0] += 1
        m[g][1] += abs(g - sum(nb) / len(nb))
    return m


def ngtdm_features_oracle(m) -> dict:
    """Literal loops per ngtdm.py:124-188."""
    lvl = len(m)
    n = sum(r[0] for r in m)
    if n == 0:
        return {}
    n_g = sum(1 for r in m if r[0] != 0)
    s2 = sum(r[1] for r in m)
    denc = sum(r[0] * r[1] for r in m)
    coarseness = 1_000_000.0 if denc == 0 else n / denc
    s1 = sum(m[i][0] * m[j][0] * (i - j) ** 2 / n**2 for i in range(lvl) for j in range(lvl))
    d = n_g * (n_g - 1) * n
    contrast = 0.0 if d == 0 else s1 * s2 / d
    num_b = sum(m[i][0] * m[i][1] / n for i in range(lvl))
    den_b = sum(
        abs(i * m[i][0] - j * m[j][0]) / n
        for i in range(lvl)
        for j in range(lvl)
        if m[i][0] != 0 and m[j][0] != 0
    )
    busy = 0.0 if den_b == 0 else num_b / den_b
    compl_sum = 0.0
    for i in range(lvl):
        if m[i][0] == 0:
            continue
        for j in range(lvl):
            if m[j][0] == 0:
                continue
            num = (m[i][0] * m[i][1] + m[j][0] * m[j][1]) * abs(i - j) / n
            den = (m[i][0] + m[j][0]) / n
            compl_sum += num / den
    num_s = sum(
        (m[i][0] + m[j][0]) * (i - j) ** 2 / n
        for i in range(lvl)
        for j in range(lvl)
        if m[i][0] != 0 and m[j][0] != 0
    )
    return {
        "ngt_coarseness": coarseness,
        "ngt_contrast": contrast,
        "ngt_busyness": busy,
        "ngt_complexity": compl_sum / n,
        "ngt_strength": 0.0 if s2 == 0 else num_s / s2,
    }


def ngldm_oracle(seq, lvl) -> list:
    """Naive dependence-count scan -> (lvl x 3) matrix."""
    n = len(seq)
    m = [[0.0] * 3 for _ in range(lvl)]
    for i in range(n):
        if math.isnan(seq[i]):
            continue
        dep = 0
        for k in (i - 1, i + 1):
            if 0 <= k < n and not math.isnan(seq[k]) and seq[k] == seq[i]:
                dep += 1
        m[int(seq[i])][dep] += 1
    return m


def border_distance_oracle(eligible, session):
    """Naive per-position wall scan."""
    n = len(eligible)
    out = [0] * n
    for i in range(n):
        if not eligible[i]:
            continue
        d = 1
        j = i - 1
        while j >= 0 and eligible[j] and session[j] == session[i]:
            d += 1
            j -= 1
        left = d
        d = 1
        j = i + 1
        while j < n and eligible[j] and session[j] == session[i]:
            d += 1
            j += 1
        out[i] = min(left, d)
    return out
