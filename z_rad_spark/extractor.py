"""The point-in-time feature extractor — the engine's flagship operator.

Logical plan (all declarative until the single grouped-map kernel)::

    transcripts scan
      -> ts <= max(cutoffs) filter            (predicate pushdown to scan)
      -> signal + eligibility columns          (whole-stage codegen)
      -> groupBy(conv_id).applyInPandas(...)   (one Arrow batch per conv)
      -> wide feature row per (conv_id, as_of)

Scale notes
-----------
* The shuffle key is ``conv_id`` — the same key every other per-entity
  operator uses, so plans that chain extraction with as-of joins or
  sessionization reuse one exchange.
* All cutoffs for a conversation are swept in ONE pass over its sorted
  turns (prefix views of a single sort), so the cost is
  O(turns + cutoffs * kernel) per entity, not O(turns * cutoffs).
* Skewed giant conversations: see operators/skew.py (salted partial
  pre-aggregation). The kernel itself is O(turns) with small constants.
* Temporal-leakage safety is structural: the kernel receives only rows
  with ts <= max(cutoff), and each per-cutoff computation slices
  ts <= cutoff before anything else (verified by the perturbation
  property test in tests/test_leakage.py).

Reference lifecycle being re-expressed: Radiomics.extract_features
(zrad/radiomics/extractor.py:71-155) + the per-patient joblib map
(zrad/gui/rad_tab.py:36-117, 377-391) -> Spark tasks over conv groups.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import FeatureConfig
from .kernels import firstorder, prep, shape, texture
from .transcripts import with_signal

ROLE_CODE = {"user": 0, "assistant": 1, "system": 2, "tool": 3}


def feature_names(cfg: FeatureConfig) -> list[str]:
    """Ordered output feature names for a config (suffix conventions per
    zrad/radiomics/texture_aggregation.py:13-21)."""
    names: list[str] = []
    fam = cfg.families
    if "stats" in fam:
        names += list(firstorder.STATS_NAMES)
    if "hist" in fam:
        names += list(firstorder.HIST_NAMES)
    if "ivh" in fam:
        names += list(firstorder.IVH_NAMES)
    if "local" in fam:
        names += list(firstorder.LOCAL_NAMES)
    if "shape" in fam:
        names += list(shape.SHAPE_NAMES)
        if cfg.enable_moran:
            names += list(shape.MORAN_NAMES)
    cm_sfx, d_sfx = cfg.cm_suffix, cfg.dim_suffix
    if "glcm" in fam:
        names += [f"{n}_{cm_sfx}" for n in texture.GLCM_NAMES]
    if "glrlm" in fam:
        names += [f"{n}_{cm_sfx}" for n in texture.GLRLM_NAMES]
    if "glszm" in fam:
        names += [f"{n}_{d_sfx}" for n in texture.GLSZM_NAMES]
    if "gldzm" in fam:
        names += [f"{n}_{d_sfx}" for n in texture.GLDZM_NAMES]
    if "ngtdm" in fam:
        names += [f"{n}_{d_sfx}" for n in texture.NGTDM_NAMES]
    if "ngldm" in fam:
        names += [f"{n}_{d_sfx}" for n in texture.NGLDM_NAMES]
    return names


def output_schema(cfg: FeatureConfig) -> T.StructType:
    fields = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("as_of", T.TimestampType(), False),
        T.StructField("n_turns", T.LongType(), True),
        T.StructField("n_eligible", T.LongType(), True),
        T.StructField("n_bins", T.LongType(), True),
    ]
    fields += [T.StructField(n, T.DoubleType(), True) for n in feature_names(cfg)]
    return T.StructType(fields)


def compute_one(
    ts_us: np.ndarray,
    signal: np.ndarray,
    eligible: np.ndarray,
    role_codes: np.ndarray,
    tool_mask: np.ndarray,
    cfg: FeatureConfig,
) -> dict:
    """Feature vector for ONE (conversation, as_of) — the prepared arrays
    are already cutoff-filtered and in stable (ts, turn_idx) order.

    This is the analogue of Radiomics.extract_features on one RoiData
    (zrad/radiomics/extractor.py:71-155): shared intermediates (masked
    signal, grey levels, sessions) are prepared once and reused by every
    requested family, like prepare_extraction_data
    (zrad/radiomics/extraction_preparation.py:18-56).
    """
    out: dict = {}
    n = ts_us.size
    out["n_turns"] = int(n)

    # feature signal: optionally filter-convolved (inside the cutoff slice,
    # so the filter window can never read post-cutoff turns)
    if cfg.filter_name is not None:
        from .kernels.filters import apply_filter

        feature_signal = apply_filter(signal, cfg.filter_name, **dict(cfg.filter_params))
    else:
        feature_signal = signal

    # intensity mask: feature signal where eligible else NaN (roi.py:88-119)
    masked = prep.apply_eligibility(feature_signal, eligible)
    # resegmentation: range on raw signal, then outlier on current mask
    masked = prep.resegment(masked, signal, cfg.intensity_range, cfg.outlier_sigma)
    n_eligible = int(np.sum(~np.isnan(masked)))
    out["n_eligible"] = n_eligible

    names = feature_names(cfg)
    if n_eligible < cfg.min_turns:
        # min-turn guard: null features, not exceptions (masks.py:57-59)
        out.update({k: np.nan for k in names})
        out["n_bins"] = 0
        return out

    sessions = prep.sessionize(ts_us, cfg.gap_seconds)

    # texture discretization (TextureDiscretizer, discretization.py:333-356);
    # FBS anchors at the resegmentation lower bound when configured
    if cfg.bin_size is not None:
        anchor = cfg.intensity_range[0] if cfg.intensity_range else None
        grey = prep.discretize_fbs(masked, cfg.bin_size, anchor)
    elif cfg.n_bins is not None:
        grey = prep.discretize_fbn(masked, cfg.n_bins)
    else:
        grey = masked  # direct: signal already small positive ints
    valid_grey = grey[~np.isnan(grey)]
    out["n_bins"] = int(np.unique(valid_grey).size) if valid_grey.size else 0

    fam = cfg.families
    if "stats" in fam:
        out.update(firstorder.stats_features(masked))
    if "hist" in fam:
        out.update(firstorder.hist_features(grey))
    if "ivh" in fam:
        ivh_arr, lo, hi, step = prep.ivh_prepare(
            masked,
            cfg.ivh_method,
            n_bins=cfg.ivh_n_bins,
            bin_size=cfg.ivh_bin_size,
            minimum=cfg.intensity_range[0] if cfg.intensity_range else None,
        )
        out.update(firstorder.ivh_features(ivh_arr, lo, hi, step))
    if "local" in fam:
        out.update(firstorder.local_features(feature_signal, masked, cfg.local_radius))
    if "shape" in fam:
        out.update(shape.shape_features(ts_us, eligible, sessions, role_codes, tool_mask, masked))
        if cfg.enable_moran:
            out.update(shape.moran_geary(ts_us, masked))

    args = (cfg.aggr_dim, cfg.aggr_method)
    sw, sm = cfg.slice_weight, cfg.slice_median
    cm_sfx, d_sfx = cfg.cm_suffix, cfg.dim_suffix
    if "glcm" in fam:
        vals = texture.glcm_features(grey, sessions, None, cfg.lags, sw, sm, *args)
        out.update({f"{k}_{cm_sfx}": v for k, v in vals.items()})
    zone_vals = None
    if "glrlm" in fam or "glszm" in fam:
        # one run decomposition serves both: 1-D zones == runs and the
        # voxel normalizer is identical (direction multiplicity 1), so
        # GLSZM values equal GLRLM's under different names — asserted by
        # tests/test_aggregations.py::test_glszm_equals_glrlm_matrix_in_1d
        zone_vals = texture.glrlm_features(grey, sessions, eligible, cfg.aggr_dim, sw, sm)
    if "glrlm" in fam:
        out.update({f"{k}_{cm_sfx}": v for k, v in zone_vals.items()})
    if "glszm" in fam:
        out.update(
            {f"{n}_{d_sfx}": v for n, v in zip(texture.GLSZM_NAMES, zone_vals.values())}
        )
    if "gldzm" in fam:
        vals = texture.gldzm_features(grey, sessions, eligible, cfg.aggr_dim, sw, sm)
        out.update({f"{k}_{d_sfx}": v for k, v in vals.items()})
    if "ngtdm" in fam:
        vals = texture.ngtdm_features(grey, sessions, cfg.aggr_dim, sw, sm)
        out.update({f"{k}_{d_sfx}": v for k, v in vals.items()})
    if "ngldm" in fam:
        vals = texture.ngldm_features(grey, sessions, cfg.aggr_dim, sw, sm)
        out.update({f"{k}_{d_sfx}": v for k, v in vals.items()})
    return out


def _make_kernel(cfg: FeatureConfig, cutoffs_us: list[int], columns: list[str]):
    """Grouped-map kernel closure over one BUCKET of conversations.

    One kernel call per hash bucket, not per conversation: at 10^8+
    conversations a per-conversation grouped map pays the Arrow/pandas
    boundary cost 10^8 times; bucketing amortizes it to one crossing per
    bucket while the per-conversation work stays pure NumPy slicing. Inside
    a bucket, one stable lexicographic sort on (conv_id, ts, turn_idx)
    yields every conversation as a contiguous slice; the cutoff sweep then
    shares that single sort per conversation (np.searchsorted prefixes)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable secondary sort on integer keys: factorize conv_id once
        # (string compares are the hot cost at scale) and np.lexsort —
        # stable, so (ts, turn_idx) ties keep input order like mergesort
        codes, conv_names = pd.factorize(pdf["conv_id"].to_numpy())
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        turn = pdf["turn_idx"].to_numpy(dtype=np.int64)
        order = np.lexsort((turn, ts_us, codes))
        codes = codes[order]
        ts_us = ts_us[order]
        signal = pdf["signal"].to_numpy(dtype=np.float64)[order]
        eligible = pdf["eligible"].to_numpy(dtype=bool)[order]
        role_codes = pdf["role_code"].to_numpy(dtype=np.int64)[order]
        tool_mask = pdf["has_tool"].to_numpy(dtype=bool)[order]

        # conversation boundaries within the sorted bucket
        brk = np.nonzero(codes[1:] != codes[:-1])[0] + 1
        starts = np.concatenate(([0], brk))
        ends = np.concatenate((brk, [codes.size]))

        rows = []
        n_failed = 0
        first_err: Exception | None = None
        first_err_conv = None
        for s, e in zip(starts, ends):
            t_slice = ts_us[s:e]
            conv_id = conv_names[codes[s]]
            for cut in cutoffs_us:
                hi = s + int(np.searchsorted(t_slice, cut, side="right"))
                row = {"conv_id": conv_id, "as_of": np.datetime64(cut, "us")}
                try:
                    row.update(
                        compute_one(
                            ts_us[s:hi], signal[s:hi], eligible[s:hi],
                            role_codes[s:hi], tool_mask[s:hi], cfg,
                        )
                    )
                except Exception as ex:
                    # per-entity error isolation (rad_tab.py:109-112 skip &
                    # log analogue): one bad conversation must not fail the
                    # task at 10^8-entity scale — emit a null feature row,
                    # but COUNT it and log the first exception per bucket so
                    # a systematic kernel bug surfaces as a diagnosable
                    # null-row storm, not silence
                    row.update({"n_turns": int(hi - s)})
                    n_failed += 1
                    if first_err is None:
                        first_err, first_err_conv = ex, conv_id
                rows.append(row)
        if n_failed:
            import logging

            logging.getLogger("z_rad_spark.extractor").error(
                "feature kernel: %d/%d (conv, cutoff) computations failed in "
                "this bucket; first failure conv_id=%r: %r",
                n_failed, len(rows), first_err_conv, first_err,
            )
        return pd.DataFrame(rows, columns=columns)

    return kernel


def prepare_input(df: DataFrame, cfg: FeatureConfig) -> DataFrame:
    """Attach signal / eligibility / role-code columns (pure JVM exprs)."""
    df = with_signal(df, cfg.signal)
    if cfg.eligible_roles is None:
        elig = F.lit(True)
    else:
        elig = F.col("role").isin(*cfg.eligible_roles)
    role_code = F.coalesce(
        *[F.when(F.col("role") == k, F.lit(v)) for k, v in ROLE_CODE.items()],
        F.lit(-1),
    )
    return df.select(
        "conv_id",
        "turn_idx",
        "ts",
        "signal",
        elig.cast("boolean").alias("eligible"),
        role_code.cast("long").alias("role_code"),
        F.col("tool").isNotNull().alias("has_tool"),
    )


def extract_features(df: DataFrame, cfg: FeatureConfig, cutoffs: Iterable) -> DataFrame:
    """Point-in-time feature vectors for every conversation at every cutoff.

    ``cutoffs`` — iterable of timestamps (str / datetime / np.datetime64).
    Returns one wide row per (conv_id, as_of).
    """
    cutoffs_us = sorted(int(np.datetime64(c, "us").astype(np.int64)) for c in cutoffs)
    max_cut = np.datetime64(max(cutoffs_us), "us")

    prepared = prepare_input(df, cfg)
    # structural leakage guard + scan-level pruning: nothing after the last
    # cutoff is ever read by the kernel
    prepared = prepared.filter(F.col("ts") <= F.lit(max_cut.item()))

    # Bucketed grouped map: the shuffle/group key is a hash bucket of
    # conv_id, not conv_id itself. One Arrow exchange + one kernel call per
    # bucket amortizes the Python boundary over thousands of conversations
    # (at 10^8+ entities a per-entity grouped map is boundary-bound), while
    # hash bucketing keeps every conversation wholly inside one bucket.
    # Bucket count = 4x parallelism: enough granularity for AQE-free load
    # balance, coarse enough that per-call overhead stays amortized. A
    # user-specified repartition count is never coalesced by AQE (byte-based
    # coalescing would serialize this CPU-bound stage onto few tasks), and
    # hashpartitioning on bucket satisfies the groupBy — no second shuffle.
    spark = prepared.sparkSession
    # Bucket count defaults to 4x parallelism, overridable via
    # spark.z_rad_spark.extract.buckets. On a real cluster you size the
    # partition count to the DATASET, not to whichever cluster size runs
    # the job — a fixed count across N and 4N executors is what makes
    # cluster-size scaling comparisons (and reruns) apples-to-apples.
    n_parts = int(spark.conf.get("spark.z_rad_spark.extract.buckets", "0")) or max(
        4 * spark.sparkContext.defaultParallelism, 8
    )
    prepared = prepared.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_parts)).cast("int")
    ).repartition(n_parts, "bucket")

    schema = output_schema(cfg)
    kernel = _make_kernel(cfg, cutoffs_us, [f.name for f in schema.fields])
    return prepared.groupBy("bucket").applyInPandas(kernel, schema=schema)
