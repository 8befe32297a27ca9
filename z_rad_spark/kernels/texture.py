"""Texture-matrix kernels — 1-D temporal analogues of Z-Rad's families.

The discretized grey-level vector of one conversation (stable (ts,
turn_idx) order, NaN holes for ineligible turns) plays the role of the
voxel volume; gap-delimited sessions play the role of slices; temporal
lags play the role of spatial directions:

* GLCM   — lag-k bigram co-occurrence (zrad/radiomics/glcm.py:36-509)
* GLRLM  — runs of equal grey level     (zrad/radiomics/glrlm.py:28-318)
* GLSZM  — zones == runs in 1-D         (zrad/radiomics/glszm.py:28-153)
* GLDZM  — zones + distance-to-border   (zrad/radiomics/gldzm.py:28-159)
* NGTDM  — neighbour grey-tone diff     (zrad/radiomics/ngtdm.py:17-257)
* NGLDM  — neighbour dependence counts  (zrad/radiomics/ngldm.py:30-223)

Aggregation semantics follow the reference exactly (glcm.py:437-509):
"merge" sums count matrices BEFORE normalizing; "average" computes
features per matrix then (weighted-)averages — the order is contractual.

All matrices are tiny (lvl x lvl with lvl <= O(64)); every build is a
vectorized np.add.at / bincount, never per-element Python.
"""

from __future__ import annotations

import numpy as np

from .prep import border_distance

GLCM_NAMES = (
    "cm_joint_max",
    "cm_joint_avg",
    "cm_joint_var",
    "cm_joint_entr",
    "cm_diff_avg",
    "cm_diff_var",
    "cm_diff_entr",
    "cm_sum_avg",
    "cm_sum_var",
    "cm_sum_entr",
    "cm_energy",
    "cm_contrast",
    "cm_dissimilarity",
    "cm_inv_diff",
    "cm_inv_diff_norm",
    "cm_inv_diff_mom",
    "cm_inv_diff_mom_norm",
    "cm_inv_var",
    "cm_corr",
    "cm_auto_corr",
    "cm_clust_tend",
    "cm_clust_shade",
    "cm_clust_prom",
    "cm_info_corr1",
    "cm_info_corr2",
)

# shared 16-attribute reducer order (zrad/radiomics/texture_base.py:6-26)
TEXTURE_ATTRS = (
    "short_runs_emphasis",
    "long_runs_emphasis",
    "low_grey_level_run_emphasis",
    "high_gr_lvl_emphasis",
    "short_low_gr_lvl_emphasis",
    "short_high_gr_lvl_emphasis",
    "long_low_gr_lvl_emphasis",
    "long_high_gr_lvl_emphasis",
    "non_uniformity",
    "norm_non_uniformity",
    "length_non_uniformity",
    "norm_length_non_uniformity",
    "percentage",
    "gr_lvl_var",
    "length_var",
    "entropy",
)
NGLDM_ATTRS = TEXTURE_ATTRS + ("energy",)

GLRLM_NAMES = (
    "rlm_sre",
    "rlm_lre",
    "rlm_lgre",
    "rlm_hgre",
    "rlm_srlge",
    "rlm_srhge",
    "rlm_lrlge",
    "rlm_lrhge",
    "rlm_glnu",
    "rlm_glnu_norm",
    "rlm_rlnu",
    "rlm_rlnu_norm",
    "rlm_r_perc",
    "rlm_gl_var",
    "rlm_rl_var",
    "rlm_rl_entr",
)
GLSZM_NAMES = (
    "szm_sze",
    "szm_lze",
    "szm_lgze",
    "szm_hgze",
    "szm_szlge",
    "szm_szhge",
    "szm_lzlge",
    "szm_lzhge",
    "szm_glnu",
    "szm_glnu_norm",
    "szm_zsnu",
    "szm_zsnu_norm",
    "szm_z_perc",
    "szm_gl_var",
    "szm_zs_var",
    "szm_zs_entr",
)
GLDZM_NAMES = (
    "dzm_sde",
    "dzm_lde",
    "dzm_lgze",
    "dzm_hgze",
    "dzm_sdlge",
    "dzm_sdhge",
    "dzm_ldlge",
    "dzm_ldhge",
    "dzm_glnu",
    "dzm_glnu_norm",
    "dzm_zdnu",
    "dzm_zdnu_norm",
    "dzm_z_perc",
    "dzm_gl_var",
    "dzm_zd_var",
    "dzm_zd_entr",
)
NGTDM_NAMES = ("ngt_coarseness", "ngt_contrast", "ngt_busyness", "ngt_complexity", "ngt_strength")
NGLDM_NAMES = (
    "ngl_lde",
    "ngl_hde",
    "ngl_lgce",
    "ngl_hgce",
    "ngl_ldlge",
    "ngl_ldhge",
    "ngl_hdlge",
    "ngl_hdhge",
    "ngl_glnu",
    "ngl_glnu_norm",
    "ngl_dcnu",
    "ngl_dcnu_norm",
    "ngl_dc_perc",
    "ngl_gl_var",
    "ngl_dc_var",
    "ngl_dc_entr",
    "ngl_dc_energy",
)

SENTINEL = 1_000_000.0


def _seq_sum(a) -> float:
    """Strict left-to-right sequential sum. The reciprocal-square
    reductions (cm_inv_var, dzm_sde/sdhge) have non-dyadic terms whose
    float sum is order-dependent in the last ulp; NumPy's pairwise/
    unrolled reduction and SQL's unordered SUM can land on opposite sides
    of a 6dp rounding boundary (~5 per 700k values at sf0.1 —
    BASELINE.md round-3 update 2). The SQL oracles fold the same terms
    with an ORDER BY-ed list_reduce, so both engines execute the
    identical double-add sequence and agree bit-for-bit."""
    acc = 0.0
    for x in a:
        acc += float(x)
    return acc


# --------------------------------------------------------------------------
# GLCM
# --------------------------------------------------------------------------


def glcm_count_matrix(g: np.ndarray, lag: int, lvl: int, session: np.ndarray | None = None) -> np.ndarray:
    """Symmetrized lag-k co-occurrence counts.

    Pairs (g[i], g[i+lag]) where both finite; when ``session`` is given,
    pairs must stay within one session (the per-slice analogue). Symmetrize
    by adding the transpose (reference: glcm.py:163, 205-206).
    """
    m = np.zeros((lvl, lvl), dtype=np.float64)
    if g.size <= lag:
        return m
    a, b = g[:-lag], g[lag:]
    valid = ~np.isnan(a) & ~np.isnan(b)
    if session is not None:
        valid &= session[:-lag] == session[lag:]
    if valid.any():
        ai = a[valid].astype(np.int64)
        bi = b[valid].astype(np.int64)
        np.add.at(m, (ai, bi), 1.0)
        np.add.at(m, (bi, ai), 1.0)
    return m


def glcm_feature_values(M: np.ndarray) -> dict:
    """All 25 GLCM scalar reductions from a COUNT matrix (caller guarantees
    M.sum() > 0; normalization happens inside).

    Vectorized equivalents of zrad/radiomics/glcm.py:211-420 — including the
    O(lvl^2) info-corr loops (glcm.py:252-281). Joint-matrix sums iterate
    NONZERO cells only (M is sparse: <= one cell per observed pair value);
    zero cells contribute 0 to every weighted sum.

    Determinism contract (same as kernels/firstorder._det_stats): every
    reduction whose numerator is an INTEGER-weighted sum (max, averages,
    energy, contrast, dissimilarity, auto-correlation, the marginal mean)
    is computed as exact-integer-sum / total — one division at the end —
    so NumPy's pairwise summation and SQL's sequential SUM produce the
    bit-identical double. Summing pre-divided p-terms instead puts dyadic
    true values (e.g. sum p^2 = 0.0340625) exactly on the driver's 6dp
    rounding boundary, where a 1-ulp order difference flips the hash.
    """
    s = float(M.sum())
    lvl = M.shape[0]
    ii, jj = np.nonzero(M)
    cs = M[ii, jj]
    ps = cs / s
    di = np.abs(ii - jj)
    cm_minus = np.bincount(di, weights=cs, minlength=lvl)
    cm_plus = np.bincount(ii + jj, weights=cs, minlength=2 * lvl - 1)
    p_minus = cm_minus / s
    p_plus = cm_plus / s
    km = np.arange(p_minus.size)
    kp = np.arange(p_plus.size)

    joint_avg = float((cs * ii).sum()) / s
    diff_avg = float((cm_minus * km).sum()) / s
    sum_avg = float((cm_plus * kp).sum()) / s

    joint_entr = float(-(ps * np.log2(ps)).sum())
    nzm = p_minus > 0
    nzp = p_plus > 0

    c_i = np.bincount(jj, weights=cs, minlength=lvl)
    p_i = c_i / s
    idx = np.arange(lvl)
    mu_i = float((c_i * idx).sum()) / s
    sigma_i2 = float(((idx - mu_i) ** 2 * p_i).sum())
    auto_corr = float((cs * ii * jj).sum()) / s
    corr = np.nan if sigma_i2 == 0 else (auto_corr - mu_i**2) / sigma_i2

    n_g = lvl - 1
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_diff_norm = np.nan if n_g == 0 else float((ps / (1 + di / n_g)).sum())
        inv_diff_mom_norm = np.nan if n_g == 0 else float((p_minus / (1 + (km / n_g) ** 2)).sum())

    # information correlations (glcm.py:252-281): every nonzero cell has
    # nonzero marginals, so hxy1 needs no masking; hxy2 runs on the
    # compacted nonzero marginal vector
    nzpi = p_i[p_i > 0]
    hx = float(-(nzpi * np.log2(nzpi)).sum())
    hxy1 = float(-(ps * np.log2(p_i[ii] * p_i[jj])).sum())
    q = np.outer(nzpi, nzpi)
    hxy2 = float(-(q * np.log2(q)).sum())
    info1 = np.nan if hx == 0 else (joint_entr - hxy1) / hx
    with np.errstate(invalid="ignore"):
        info2 = float(np.sqrt(1 - np.exp(-2 * (hxy2 - joint_entr))))

    cdev = ii + jj - 2 * mu_i
    return {
        "cm_joint_max": float(cs.max()) / s,
        "cm_joint_avg": joint_avg,
        "cm_joint_var": float((ps * (ii - joint_avg) ** 2).sum()),
        "cm_joint_entr": joint_entr,
        "cm_diff_avg": diff_avg,
        "cm_diff_var": float((p_minus * (km - diff_avg) ** 2).sum()),
        "cm_diff_entr": float(-(p_minus[nzm] * np.log2(p_minus[nzm])).sum()),
        "cm_sum_avg": sum_avg,
        "cm_sum_var": float((p_plus * (kp - sum_avg) ** 2).sum()),
        "cm_sum_entr": float(-(p_plus[nzp] * np.log2(p_plus[nzp])).sum()),
        "cm_energy": float((cs * cs).sum()) / (s * s),
        "cm_contrast": float((cs * (ii - jj) ** 2).sum()) / s,
        "cm_dissimilarity": float((cs * di).sum()) / s,
        "cm_inv_diff": float((ps / (1 + di)).sum()),
        "cm_inv_diff_norm": inv_diff_norm,
        "cm_inv_diff_mom": float((p_minus / (1 + km**2)).sum()),
        "cm_inv_diff_mom_norm": inv_diff_mom_norm,
        # ordered fold (k ascending) — see _seq_sum; zero terms are no-ops
        "cm_inv_var": _seq_sum(p_minus[1:] / km[1:] ** 2) if lvl > 1 else 0.0,
        "cm_corr": corr,
        "cm_auto_corr": auto_corr,
        "cm_clust_tend": float((cdev**2 * ps).sum()),
        "cm_clust_shade": float((cdev**3 * ps).sum()),
        "cm_clust_prom": float((cdev**4 * ps).sum()),
        "cm_info_corr1": info1,
        "cm_info_corr2": info2,
    }


def _agg_dicts(dicts, names, weights=None, median=False):
    """Feature-dict aggregation (reference: glcm.py:422-435,
    texture_base.py:70-78)."""
    if not dicts:
        return {n: np.nan for n in names}
    if median:
        return {n: float(np.median([d[n] for d in dicts])) for n in names}
    return {n: float(np.average([d[n] for d in dicts], weights=weights)) for n in names}


def glcm_features(g, session, sess_counts, lags, slice_weight, slice_median, aggr_dim, aggr_method) -> dict:
    """GLCM features with full aggregation-method support.

    2D = per-(session, lag) matrices; 2.5D = merged across sessions;
    3D = whole-conversation pairs (lags may cross session borders, like 3-D
    directions cross slices). Reference dispatch: glcm.py:104-130.
    """
    finite = ~np.isnan(g)
    if not finite.any():
        return {n: np.nan for n in GLCM_NAMES}
    lvl = int(np.nanmax(g)) + 1
    total = int(finite.sum())

    if aggr_dim == "3D":
        if aggr_method == "MERG":
            # merged matrix in ONE scatter-add: gather valid pair indices
            # across all lags, add both symmetric directions at once
            ai_all, bi_all = [], []
            for lag in lags:
                if g.size <= lag:
                    continue
                a, b = g[:-lag], g[lag:]
                valid = ~np.isnan(a) & ~np.isnan(b)
                if valid.any():
                    ai_all.append(a[valid].astype(np.int64))
                    bi_all.append(b[valid].astype(np.int64))
            m = np.zeros((lvl, lvl), dtype=np.float64)
            if ai_all:
                ai = np.concatenate(ai_all)
                bi = np.concatenate(bi_all)
                np.add.at(m, (np.concatenate((ai, bi)), np.concatenate((bi, ai))), 1.0)
            return glcm_feature_values(m) if m.sum() > 0 else {n: np.nan for n in GLCM_NAMES}
        mats = [glcm_count_matrix(g, lag, lvl) for lag in lags]
        dicts = [glcm_feature_values(m) for m in mats if m.sum() > 0]
        return _agg_dicts(dicts, GLCM_NAMES)

    # per-session matrices: sessions with no finite grey are skipped, like
    # all-NaN slices (glcm.py:156-158)
    sess_ids = [s for s in np.unique(session) if np.any(finite & (session == s))]
    per_sess = []
    weights_per_sess = []
    for s in sess_ids:
        seg = g[session == s]
        per_sess.append([glcm_count_matrix(seg, lag, lvl) for lag in lags])
        weights_per_sess.append(float(np.sum(~np.isnan(seg))) / total if slice_weight else 1.0)

    if aggr_dim == "2.5D":
        if aggr_method == "MERG":
            msum = np.sum([m for row in per_sess for m in row], axis=0)
            return glcm_feature_values(msum) if msum.sum() > 0 else {n: np.nan for n in GLCM_NAMES}
        # DIR_MERG: sum over sessions per lag, features per lag, plain mean
        dicts = []
        for li in range(len(lags)):
            msum = np.sum([row[li] for row in per_sess], axis=0)
            if msum.sum() > 0:
                dicts.append(glcm_feature_values(msum))
        return _agg_dicts(dicts, GLCM_NAMES)

    # 2D
    if slice_median and slice_weight:
        raise ValueError("weighted median is not supported for texture aggregation")
    dicts, weights = [], []
    if aggr_method == "SLICE_MERG":
        for row, w in zip(per_sess, weights_per_sess):
            msum = np.sum(row, axis=0)
            if msum.sum() > 0:
                dicts.append(glcm_feature_values(msum))
                weights.append(w)
    else:  # AVER
        for row, w in zip(per_sess, weights_per_sess):
            for m in row:
                if m.sum() > 0:
                    dicts.append(glcm_feature_values(m))
                    weights.append(w)
    return _agg_dicts(dicts, GLCM_NAMES, None if slice_median else weights, median=slice_median)


# --------------------------------------------------------------------------
# shared 16(+energy) reducer for the run/zone/dependence families
# --------------------------------------------------------------------------


def matrix_feature_values(
    M: np.ndarray, voxel_count: float, include_energy: bool = False,
    ordered_recip: bool = False,
) -> dict:
    """Vectorized port of TextureFeatureBase._matrix_feature_values
    (zrad/radiomics/texture_base.py:40-214). M holds raw counts indexed
    [grey_level, length-1]; zero-denominator cases yield NaN instead of the
    reference's DataStructureError (scale contract: null rows, not
    exceptions).

    ``ordered_recip``: compute the two reciprocal-square reductions whose
    cross-engine ulp drift was actually observed at sf0.1 (the GLDZM
    sde/sdhge columns — BASELINE.md round-3 update 2) with the strict
    sequential (lvl asc, jl asc) per-cell fold that the DZM oracles
    mirror via ORDER BY-ed list_reduce. Enabled by the DZM family only;
    the RLM/SZM/NGLDM twins keep the vectorized reduction (no observed
    drift, and their oracles sum unordered)."""
    names = NGLDM_ATTRS if include_energy else TEXTURE_ATTRS
    n_s = float(M.sum())
    if n_s == 0 or voxel_count == 0:
        return {n: np.nan for n in names}
    # iterate nonzero cells only (matrices are sparse: <= one cell per
    # distinct (level, length) pair); zero cells contribute 0 to every sum
    ii, jj = np.nonzero(M)
    cs = M[ii, jj]
    i_f = ii.astype(np.float64)
    jl = (jj + 1).astype(np.float64)
    j_f = jj.astype(np.float64)
    p = cs / n_s
    i2 = i_f * i_f
    jl2 = jl * jl
    nzi = ii != 0
    row2 = M.sum(axis=1)
    col2 = M.sum(axis=0)
    mu_i = float((p * i_f).sum())
    mu_j = float((p * j_f).sum())

    # np.nonzero is row-major: cells arrive (lvl asc, jl asc) — the same
    # order the ordered_recip folds and their SQL mirrors use
    sde_sum = _seq_sum(cs / jl2) if ordered_recip else float((cs / jl2).sum())
    sdhge_sum = (
        _seq_sum(i2 * cs / jl2) if ordered_recip else float((i2 * cs / jl2).sum())
    )
    out = {
        "short_runs_emphasis": sde_sum / n_s,
        "long_runs_emphasis": float((cs * jl2).sum() / n_s),
        "low_grey_level_run_emphasis": float((cs[nzi] / i2[nzi]).sum() / n_s),
        "high_gr_lvl_emphasis": float((cs * i2).sum() / n_s),
        "short_low_gr_lvl_emphasis": float((cs[nzi] / i2[nzi] / jl2[nzi]).sum() / n_s),
        "short_high_gr_lvl_emphasis": sdhge_sum / n_s,
        "long_low_gr_lvl_emphasis": float((cs[nzi] * jl2[nzi] / i2[nzi]).sum() / n_s),
        "long_high_gr_lvl_emphasis": float((cs * jl2 * i2).sum() / n_s),
        "non_uniformity": float((row2 * row2).sum() / n_s),
        "norm_non_uniformity": float((row2 * row2).sum() / n_s**2),
        "length_non_uniformity": float((col2 * col2).sum() / n_s),
        "norm_length_non_uniformity": float((col2 * col2).sum() / n_s**2),
        "percentage": float(n_s / voxel_count),
        "gr_lvl_var": float(((i_f - mu_i) ** 2 * p).sum()),
        "length_var": float(((j_f - mu_j) ** 2 * p).sum()),
        "entropy": float(-(p * np.log2(p)).sum()),
    }
    if include_energy:
        # exact form sum(c^2)/n^2: counts are integers, so the sum and the
        # single division are bit-identical to the SQL SUM(c*c)/(n_s*n_s)
        # — sum(p^2) rounds each c/n term and its sum order flips dyadic
        # results (e.g. 0.1240625) across the 6dp rounding boundary
        out["energy"] = float((cs * cs).sum()) / (n_s * n_s)
    return out


def _pad_stack(mats: list[np.ndarray]) -> np.ndarray:
    """Stack count matrices of differing widths by zero-padding columns."""
    w = max(m.shape[1] for m in mats)
    return np.stack([np.pad(m, ((0, 0), (0, w - m.shape[1]))) for m in mats])


# --------------------------------------------------------------------------
# runs (GLRLM + GLSZM zones + GLDZM zones)
# --------------------------------------------------------------------------


def find_runs(g: np.ndarray, session: np.ndarray):
    """Runs of consecutive equal finite grey levels; NaN holes and session
    borders break runs. Vectorized change-point detection — the same
    diff/split algorithm as the reference's _rle_1d
    (zrad/radiomics/glrlm.py:82-102).

    Returns (levels, lengths, start_idx, end_idx) int64 arrays.
    """
    n = g.size
    valid = ~np.isnan(g)
    if not valid.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    start = valid.copy()
    if n > 1:
        cont = valid[1:] & valid[:-1] & (session[1:] == session[:-1]) & (g[1:] == g[:-1])
        start[1:] = valid[1:] & ~cont
    idx = np.arange(n)
    starts = idx[start]
    # end of run r = (start of run r+1 scanning only valid positions) - gap
    run_id = np.cumsum(start) - 1  # valid positions only meaningful
    lengths = np.bincount(run_id[valid], minlength=starts.size)
    ends = starts + lengths - 1
    levels = g[starts].astype(np.int64)
    return levels, lengths.astype(np.int64), starts, ends


def rlm_matrix(levels, lengths, lvl, width=None) -> np.ndarray:
    w = int(width if width is not None else (lengths.max() if lengths.size else 1))
    m = np.zeros((lvl, w), dtype=np.float64)
    if levels.size:
        np.add.at(m, (levels, lengths - 1), 1.0)
    return m


def dzm_matrix(levels, starts, ends, dist, lvl, width=None) -> np.ndarray:
    """GLDZM counts: zone -> (level, min border distance). In 1-D the min
    distance over a contiguous run is min(dist[start], dist[end]) because
    the in-segment distance profile is unimodal
    (cf. zrad/radiomics/texture_base.py:329-364)."""
    if levels.size == 0:
        return np.zeros((lvl, 1), dtype=np.float64)
    min_d = np.minimum(dist[starts], dist[ends]).astype(np.int64)
    min_d = np.maximum(min_d, 1)
    w = int(width if width is not None else min_d.max())
    m = np.zeros((lvl, w), dtype=np.float64)
    np.add.at(m, (levels, min_d - 1), 1.0)
    return m


def _zone_family(g, session, eligible, aggr_dim, slice_weight, slice_median, kind, voxel_scale_dirs=1):
    """Shared driver for GLRLM / GLSZM / GLDZM (they differ only in the
    matrix builder and the voxel-count normalization; reference dispatch:
    glrlm.py:278-318, glszm.py:102-123, gldzm.py:?).

    kind: 'rlm' | 'szm' | 'dzm'. In 1-D, zones coincide with runs, so SZM
    shares the run machinery; this degeneracy is a property of the 1-D
    connectivity (26-connectivity collapses to run adjacency).
    """
    finite = ~np.isnan(g)
    names = {"rlm": GLRLM_NAMES, "szm": GLSZM_NAMES, "dzm": GLDZM_NAMES}[kind]
    if not finite.any():
        return {n: np.nan for n in names}
    lvl = int(np.nanmax(g)) + 1
    total = int(finite.sum())

    whole_session = np.zeros_like(session) if aggr_dim == "3D" else session
    if kind == "dzm":
        dist = border_distance(eligible, whole_session)

    def build(mask_sess=None):
        if mask_sess is None:
            seg, segsess, segdist = g, whole_session, dist if kind == "dzm" else None
        else:
            sel = session == mask_sess
            seg, segsess = g[sel], session[sel]
            segdist = dist[sel] if kind == "dzm" else None
        levels, lengths, starts, ends = find_runs(seg, segsess)
        if kind == "dzm":
            return dzm_matrix(levels, starts, ends, segdist, lvl)
        return rlm_matrix(levels, lengths, lvl)

    ordered = kind == "dzm"  # see matrix_feature_values ordered_recip
    if aggr_dim == "3D":
        M = build()
        vc = total * (voxel_scale_dirs if kind == "rlm" else 1)
        vals = matrix_feature_values(M, vc, ordered_recip=ordered)
        return dict(zip(names, (vals[a] for a in TEXTURE_ATTRS)))

    sess_ids = [s for s in np.unique(session) if np.any(finite & (session == s))]
    mats = [build(s) for s in sess_ids]
    counts = [float(np.sum(finite & (session == s))) for s in sess_ids]

    if aggr_dim == "2.5D":
        M = _pad_stack(mats).sum(axis=0)
        vc = sum(counts) * (voxel_scale_dirs if kind == "rlm" else 1)
        vals = matrix_feature_values(M, vc, ordered_recip=ordered)
        return dict(zip(names, (vals[a] for a in TEXTURE_ATTRS)))

    # 2D: per-session features, weighted mean / median
    if slice_median and slice_weight:
        raise ValueError("weighted median is not supported for texture aggregation")
    dicts = [matrix_feature_values(m, c, ordered_recip=ordered) for m, c in zip(mats, counts)]
    weights = [c / total if slice_weight else 1.0 for c in counts]
    vals = _agg_dicts(dicts, TEXTURE_ATTRS, None if slice_median else weights, median=slice_median)
    return dict(zip(names, (vals[a] for a in TEXTURE_ATTRS)))


def glrlm_features(g, session, eligible, aggr_dim, slice_weight, slice_median) -> dict:
    return _zone_family(g, session, eligible, aggr_dim, slice_weight, slice_median, "rlm")


def glszm_features(g, session, eligible, aggr_dim, slice_weight, slice_median) -> dict:
    return _zone_family(g, session, eligible, aggr_dim, slice_weight, slice_median, "szm")


def gldzm_features(g, session, eligible, aggr_dim, slice_weight, slice_median) -> dict:
    return _zone_family(g, session, eligible, aggr_dim, slice_weight, slice_median, "dzm")


# --------------------------------------------------------------------------
# NGTDM
# --------------------------------------------------------------------------


def ngtdm_matrix(g: np.ndarray, lvl: int) -> np.ndarray:
    """(lvl, 2) matrix of [n_i, s_i]: counts and summed |level - local mean|
    with the 1-D neighbourhood {i-1, i+1} (reference 3x3(x3) kernel with
    center zeroed: zrad/radiomics/ngtdm.py:63-122)."""
    n = g.size
    valid = ~np.isnan(g)
    f = np.where(valid, g, 0.0)
    nb_sum = np.zeros(n)
    nb_cnt = np.zeros(n)
    if n > 1:
        nb_sum[1:] += f[:-1]
        nb_sum[:-1] += f[1:]
        nb_cnt[1:] += valid[:-1]
        nb_cnt[:-1] += valid[1:]
    good = valid & (nb_cnt > 0)
    m = np.zeros((lvl, 2), dtype=np.float64)
    if good.any():
        gi = g[good].astype(np.int64)
        mean_nb = nb_sum[good] / nb_cnt[good]
        m[:, 0] = np.bincount(gi, minlength=lvl)
        m[:, 1] = np.bincount(gi, weights=np.abs(g[good] - mean_nb), minlength=lvl)
    return m


def ngtdm_feature_values(m: np.ndarray) -> dict:
    """Vectorized NGTDM reductions (reference O(lvl^2) loops:
    zrad/radiomics/ngtdm.py:124-188)."""
    ncol = m[:, 0]
    scol = m[:, 1]
    n = float(ncol.sum())
    if n == 0:
        return {k: np.nan for k in NGTDM_NAMES}
    lvl = m.shape[0]
    i = np.arange(lvl, dtype=np.float64)
    diff2 = np.subtract.outer(i, i) ** 2
    nz = ncol != 0
    n_g = float(nz.sum())

    denum_coarse = float(np.sum(ncol * scol))
    coarseness = SENTINEL if denum_coarse == 0 else n / denum_coarse

    s1 = float(ncol @ diff2 @ ncol) / n**2
    s2 = float(scol.sum())
    denum_c = n_g * (n_g - 1) * n
    contrast = 0.0 if denum_c == 0 else s1 * s2 / denum_c

    num_busy = float(np.sum(ncol * scol)) / n
    ini = i * ncol
    busy_mat = np.abs(np.subtract.outer(ini[nz], ini[nz]))
    denum_b = float(busy_mat.sum()) / n
    busyness = 0.0 if denum_b == 0 else num_busy / denum_b

    ns_nz = (ncol * scol)[nz]
    n_nz = ncol[nz]
    i_nz = i[nz]
    pair_num = (np.add.outer(ns_nz, ns_nz)) * np.abs(np.subtract.outer(i_nz, i_nz)) / n
    pair_den = np.add.outer(n_nz, n_nz) / n
    complexity = float(np.sum(pair_num / pair_den)) / n

    num_str = float(np.sum(np.add.outer(n_nz, n_nz) * np.subtract.outer(i_nz, i_nz) ** 2)) / n
    strength = 0.0 if s2 == 0 else num_str / s2

    return {
        "ngt_coarseness": coarseness,
        "ngt_contrast": contrast,
        "ngt_busyness": busyness,
        "ngt_complexity": complexity,
        "ngt_strength": strength,
    }


def ngtdm_features(g, session, aggr_dim, slice_weight, slice_median) -> dict:
    finite = ~np.isnan(g)
    if not finite.any():
        return {k: np.nan for k in NGTDM_NAMES}
    lvl = int(np.nanmax(g)) + 1
    total = int(finite.sum())
    if aggr_dim == "3D":
        return ngtdm_feature_values(ngtdm_matrix(g, lvl))
    sess_ids = [s for s in np.unique(session) if np.any(finite & (session == s))]
    mats = [ngtdm_matrix(g[session == s], lvl) for s in sess_ids]
    if aggr_dim == "2.5D":
        return ngtdm_feature_values(np.sum(mats, axis=0))
    if slice_median and slice_weight:
        raise ValueError("weighted median is not supported for texture aggregation")
    counts = [float(np.sum(finite & (session == s))) for s in sess_ids]
    # skip neighbourless sessions (single-turn): the reference raises a
    # DataStructureError for them (ngtdm.py:133-134); at scale we exclude
    # them from the per-session average instead
    keep = [i for i, m in enumerate(mats) if m[:, 0].sum() > 0]
    dicts = [ngtdm_feature_values(mats[i]) for i in keep]
    weights = [counts[i] / total if slice_weight else 1.0 for i in keep]
    return _agg_dicts(dicts, NGTDM_NAMES, None if slice_median else weights, median=slice_median)


# --------------------------------------------------------------------------
# NGLDM
# --------------------------------------------------------------------------


def ngldm_matrix(g: np.ndarray, lvl: int) -> np.ndarray:
    """(lvl, 3) dependence-count matrix: for each finite turn, the number of
    {i-1, i+1} neighbours with an equal grey level (reference 3x3(x3)
    equal-neighbour convolve: zrad/radiomics/ngldm.py:80-140)."""
    n = g.size
    valid = ~np.isnan(g)
    dep = np.zeros(n, dtype=np.int64)
    if n > 1:
        eq = valid[1:] & valid[:-1] & (g[1:] == g[:-1])
        dep[1:] += eq
        dep[:-1] += eq
    m = np.zeros((lvl, 3), dtype=np.float64)
    if valid.any():
        np.add.at(m, (g[valid].astype(np.int64), dep[valid]), 1.0)
    return m


def ngldm_features(g, session, aggr_dim, slice_weight, slice_median) -> dict:
    finite = ~np.isnan(g)
    if not finite.any():
        return {k: np.nan for k in NGLDM_NAMES}
    lvl = int(np.nanmax(g)) + 1
    total = int(finite.sum())

    def to_named(vals):
        return dict(zip(NGLDM_NAMES, (vals[a] for a in NGLDM_ATTRS)))

    if aggr_dim == "3D":
        return to_named(matrix_feature_values(ngldm_matrix(g, lvl), total, include_energy=True))
    sess_ids = [s for s in np.unique(session) if np.any(finite & (session == s))]
    mats = [ngldm_matrix(g[session == s], lvl) for s in sess_ids]
    counts = [float(np.sum(finite & (session == s))) for s in sess_ids]
    if aggr_dim == "2.5D":
        return to_named(matrix_feature_values(np.sum(mats, axis=0), sum(counts), include_energy=True))
    if slice_median and slice_weight:
        raise ValueError("weighted median is not supported for texture aggregation")
    dicts = [matrix_feature_values(m, c, include_energy=True) for m, c in zip(mats, counts)]
    weights = [c / total if slice_weight else 1.0 for c in counts]
    vals = _agg_dicts(dicts, NGLDM_ATTRS, None if slice_median else weights, median=slice_median)
    return to_named(vals)
