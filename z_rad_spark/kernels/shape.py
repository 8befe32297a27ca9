"""Conversation-shape features — the morphology-slot analogue.

Z-Rad's 23 mesh/PCA morphology features (zrad/radiomics/morphology.py:30-280)
have no faithful 1-D analogue; per SURVEY.md §2.7 this family instead
summarizes the *shape of the conversation*: duration, turn density,
inter-turn-gap distribution, session structure, and role mix. The opt-in
Moran's I / Geary's C over temporal distance mirror
zrad/radiomics/morphology.py:283-395 (1/distance weights over all pairs,
O(n^2), off by default like the reference: morphology.py:465-466).
"""

from __future__ import annotations

import numpy as np

SHAPE_NAMES = (
    "shape_n_turns",
    "shape_n_eligible",
    "shape_duration_sec",
    "shape_turn_rate",
    "shape_gap_mean",
    "shape_gap_std",
    "shape_gap_max",
    "shape_n_sessions",
    "shape_session_len_mean",
    "shape_role_entropy",
    "shape_tool_frac",
    "shape_intensity_com_shift",
)

MORAN_NAMES = ("shape_moran_i", "shape_geary_c")


def shape_features(ts_us, eligible, session, role_codes, tool_mask, masked_signal) -> dict:
    n = ts_us.size
    if n == 0:
        return {k: np.nan for k in SHAPE_NAMES}
    dur = float(ts_us[-1] - ts_us[0]) / 1e6
    gaps = np.diff(ts_us).astype(np.float64) / 1e6 if n > 1 else np.zeros(0)
    n_sessions = int(session[-1]) + 1 if n else 0
    # role codes are small non-negative ints (+ -1 for unknown): bincount
    # beats np.unique's sort on every call
    role_counts = np.bincount(role_codes + 1)
    role_counts = role_counts[role_counts > 0]
    p = role_counts / role_counts.sum()
    role_entropy = float(-np.sum(p * np.log2(p)))

    # centre-of-mass shift: |mean position of eligible turns - signal-weighted
    # mean position| in turns (analogue of morphology.py:112-122)
    pos = np.arange(n, dtype=np.float64)
    el = eligible.astype(bool)
    com_geom = float(np.mean(pos[el])) if el.any() else np.nan
    w = np.nan_to_num(masked_signal, nan=0.0)
    com_int = float(np.sum(pos * w) / np.sum(w)) if np.sum(w) > 0 else np.nan
    return {
        "shape_n_turns": float(n),
        "shape_n_eligible": float(el.sum()),
        "shape_duration_sec": dur,
        "shape_turn_rate": float(n / dur) if dur > 0 else np.nan,
        # exact form: the gap sum telescopes to (last - first), an exact
        # integer, so ONE division chain replaces a float mean whose
        # summation order differs between NumPy and SQL (at grid scale
        # that ulp flipped the 6dp hash for ~0.5% of groups)
        "shape_gap_mean": float(ts_us[-1] - ts_us[0]) / (n - 1) / 1e6 if gaps.size else np.nan,
        "shape_gap_std": float(np.std(gaps)) if gaps.size else np.nan,
        "shape_gap_max": float(np.max(gaps)) if gaps.size else np.nan,
        "shape_n_sessions": float(n_sessions),
        "shape_session_len_mean": float(n / n_sessions) if n_sessions else np.nan,
        "shape_role_entropy": role_entropy,
        "shape_tool_frac": float(np.mean(tool_mask)),
        "shape_intensity_com_shift": abs(com_geom - com_int) if np.isfinite(com_geom) and np.isfinite(com_int) else np.nan,
    }


def moran_geary(ts_us, masked_signal, max_n: int = 2000) -> dict:
    """Moran's I and Geary's C with 1/|dt| weights over all finite pairs.

    O(n^2) like the reference (morphology.py:283-395); guarded by max_n at
    scale (larger groups return NaN rather than blowing the task).
    """
    valid = ~np.isnan(masked_signal)
    x = masked_signal[valid]
    t = ts_us[valid].astype(np.float64) / 1e6
    n = x.size
    if n < 3 or n > max_n:
        return {k: np.nan for k in MORAN_NAMES}
    mu = x.mean()
    d = np.abs(np.subtract.outer(t, t))
    with np.errstate(divide="ignore"):
        w = np.where(d > 0, 1.0 / d, 0.0)
    np.fill_diagonal(w, 0.0)
    s0 = w.sum()
    dev = x - mu
    denom = np.sum(dev**2)
    if s0 == 0 or denom == 0:
        return {k: np.nan for k in MORAN_NAMES}
    moran = (n / s0) * float(dev @ w @ dev) / denom
    geary = ((n - 1) / (2 * s0)) * float(np.sum(w * np.subtract.outer(x, x) ** 2)) / denom
    return {"shape_moran_i": moran, "shape_geary_c": geary}
