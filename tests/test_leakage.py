"""North-rule property tests.

1. ZERO TEMPORAL LEAKAGE: perturbing every turn with ts > cutoff leaves
   the feature vectors bit-identical (SURVEY.md §4 item 4).
2. Per-turn TEXT EQUALITY under the stable (conv_id, ts, turn_idx)
   ordering (BASELINE.json per-row invariant).
3. Crop/prune invariance: pre-filtering rows to ts <= max(cutoff) (the
   RoiCropper analogue, reference tests/test_radiomics.py:192-211) does
   not change any feature value.
"""

import numpy as np
import pandas as pd
import pytest

from z_rad_spark.config import FeatureConfig
from z_rad_spark.extractor import extract_features
from z_rad_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts_pdf

CUT = "2024-01-03T00:00:00"
CFG = FeatureConfig(
    families=("stats", "hist", "shape", "glcm", "glrlm", "ngtdm", "ngldm"),
    aggr_dim="2D",
    aggr_method="AVER",
    n_bins=6,
    eligible_roles=("user", "assistant", "tool"),
)


@pytest.fixture(scope="module")
def pdf():
    return synth_transcripts_pdf(n_convs=6, mean_turns=40, seed=21)


def _feats(spark, frame: pd.DataFrame, cutoffs) -> pd.DataFrame:
    df = spark.createDataFrame(frame, schema=TRANSCRIPT_SCHEMA)
    out = extract_features(df, CFG, cutoffs).toPandas()
    return out.sort_values(["conv_id", "as_of"]).reset_index(drop=True)


def test_zero_temporal_leakage(spark, pdf):
    base = _feats(spark, pdf, [CUT])

    # poison every post-cutoff turn: different text, role, tool, signal
    poisoned = pdf.copy()
    after = poisoned["ts"] > np.datetime64(CUT)
    assert after.any(), "fixture must have post-cutoff turns"
    poisoned.loc[after, "text"] = "POISON " * 50
    poisoned.loc[after, "role"] = "system"
    poisoned.loc[after, "tool"] = "poison_tool"
    got = _feats(spark, poisoned, [CUT])

    pd.testing.assert_frame_equal(base, got, check_exact=True)


def test_crop_invariance(spark, pdf):
    base = _feats(spark, pdf, [CUT])
    cropped = pdf[pdf["ts"] <= np.datetime64(CUT)].reset_index(drop=True)
    got = _feats(spark, cropped, [CUT])
    pd.testing.assert_frame_equal(base, got, check_exact=True)


def test_per_turn_text_equality_and_stable_order(spark, pdf):
    """Round-trip through the engine's canonical layout preserves every
    turn's text byte-for-byte in the stable ordering."""
    from z_rad_spark.operators.skew import repartition_range

    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    back = (
        repartition_range(df, 4)
        .orderBy("conv_id", "ts", "turn_idx")
        .toPandas()
    )
    want = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    assert list(back["text"]) == list(want["text"])
    assert list(back["conv_id"]) == list(want["conv_id"])
    assert list(back["turn_idx"]) == list(want["turn_idx"])


def test_duplicate_ts_tiebreak_stability(spark, pdf):
    """Shuffling input row order must not change features: the kernel's
    mergesort on (ts, turn_idx) makes duplicate-ts groups deterministic."""
    base = _feats(spark, pdf, [CUT])
    shuffled = pdf.sample(frac=1.0, random_state=99).reset_index(drop=True)
    got = _feats(spark, shuffled, [CUT])
    pd.testing.assert_frame_equal(base, got, check_exact=True)


def test_fbn_is_per_cutoff_not_global(spark):
    """FBN min/max must come from the cutoff-filtered population: a
    conversation whose post-cutoff turns raise the max must get identical
    grey levels to one truncated at the cutoff (leakage via min/max)."""
    rows = []
    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    for i in range(30):
        rows.append(("c1", i, "user", " ".join(["t"] * (2 + i % 4)), None, base_ts + np.timedelta64(i * 60, "s")))
    # post-cutoff explosion in token count
    for i in range(30, 40):
        rows.append(("c1", i, "user", " ".join(["t"] * 200), None, base_ts + np.timedelta64(i * 3600 * 24 * 30, "s")))
    pdf2 = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf2["turn_idx"] = pdf2["turn_idx"].astype("int32")

    cut = "2024-01-01T01:00:00"
    full = _feats(spark, pdf2, [cut])
    trunc = _feats(spark, pdf2.iloc[:30].reset_index(drop=True), [cut])
    pd.testing.assert_frame_equal(full, trunc, check_exact=True)


def test_declarative_paths_zero_leakage(spark, pdf):
    """The pure-JVM plans (as-of state, declarative stats/hist) must also
    never read past the cutoff: poisoning post-cutoff turns leaves their
    outputs bit-identical."""
    from z_rad_spark.operators import firstorder_sql
    from z_rad_spark.operators.asof import asof_state
    from z_rad_spark.transcripts import with_signal

    cutoffs = [CUT]

    def run_all(frame):
        df = with_signal(spark.createDataFrame(frame, schema=TRANSCRIPT_SCHEMA))
        outs = {}
        outs["asof"] = (
            asof_state(df, spark, cutoffs, ["signal", "turn_idx"])
            .toPandas().sort_values(["conv_id", "as_of"]).reset_index(drop=True)
        )
        outs["stats"] = (
            firstorder_sql.stats_asof(df, spark, cutoffs)
            .toPandas().sort_values(["conv_id", "as_of"]).reset_index(drop=True)
        )
        outs["hist"] = (
            firstorder_sql.hist_asof(df, spark, cutoffs, 6)
            .toPandas().sort_values(["conv_id", "as_of"]).reset_index(drop=True)
        )
        return outs

    base = run_all(pdf)
    poisoned = pdf.copy()
    after = poisoned["ts"] > np.datetime64(CUT)
    assert after.any()
    poisoned.loc[after, "text"] = "POISON " * 99
    poisoned.loc[after, "role"] = "system"
    got = run_all(poisoned)
    for k in base:
        pd.testing.assert_frame_equal(base[k], got[k], check_exact=True)
