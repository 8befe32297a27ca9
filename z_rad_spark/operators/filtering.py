"""Declarative filter operators (JVM window expressions).

The mean filter is exactly expressible as a window aggregate; heavier
kernels (LoG/Laws/Gabor/wavelet) run in the grouped-map kernel
(z_rad_spark/kernels/filters.py) via FeatureConfig.filter_name. The
window form divides by the FULL support (zero-padding semantics), not the
in-window count — matching the reference's mode='constant' convolve
(zrad/filtering/spatial.py:11-64) and the kernel implementation, so both
paths are value-identical and testable against each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_mean_filter(
    df: DataFrame, support: int = 5, signal_col: str = "signal", out: str = "signal_filt"
) -> DataFrame:
    half = support // 2
    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts", "turn_idx")
        .rowsBetween(-half, support - 1 - half)
    )
    return df.withColumn(out, F.sum(F.col(signal_col)).over(w) / support)
