"""Frozen golden fixture: the flagship extraction on a fixed synthetic
frame, compared bit-tolerantly against a checked-in parquet — the IBSI
reference-CSV pattern (tests/test_ibsi_1.py:19-41 in the reference),
guarding against silent semantic drift between rounds. The fixture was
frozen from an output that passed the full DuckDB oracle gate."""

import numpy as np
import pandas as pd

from z_rad_spark.config import FeatureConfig
from z_rad_spark.extractor import extract_features
from z_rad_spark.transcripts import TRANSCRIPT_SCHEMA, synth_transcripts_pdf

GOLDEN = "tests/golden/extract_full_seed42.parquet"


def test_flagship_matches_frozen_golden(spark):
    pdf = synth_transcripts_pdf(n_convs=6, mean_turns=25, seed=42)
    cfg = FeatureConfig(
        eligible_roles=("user", "assistant", "tool"), gap_seconds=1800.0, n_bins=6
    )
    got = (
        extract_features(spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA), cfg,
                         ["2024-01-01T12:00:00", "2024-01-20T00:00:00"])
        .toPandas()
        .sort_values(["conv_id", "as_of"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = pd.read_parquet(GOLDEN)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if got[c].dtype == object or str(got[c].dtype).startswith("datetime"):
            assert (got[c] == want[c]).all(), c
        else:
            g, w = got[c].to_numpy(float), want[c].to_numpy(float)
            ok = np.isclose(g, w, rtol=0, atol=1e-9) | (np.isnan(g) & np.isnan(w))
            assert ok.all(), (c, int((~ok).sum()))
