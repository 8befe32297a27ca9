"""SUV normalization factors — the per-entity scalar normalization the
reference applies to PET activity (zrad/io/pet_suv.py:58-170: BW, Du Bois
BSA, Morgan / James-128 / Janmahasatian LBM, IBW; dispatched by
get_gml_normalization_info, pet_suv.py:173-206).

Transcript mapping: the DICOM patient attributes (weight/height/sex)
become a per-conversation scalar attribute frame; every factor is pure
column math over it — O(#conversations) rows, zero shuffle beyond the
one aggregate that builds the attribute frame, broadcast-joinable to any
turn-level frame for the actual normalization (the same shape as
q_decay_norm's per-conversation anchor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def synth_patient_attrs(turns: DataFrame, key: str = "conv_id") -> DataFrame:
    """Deterministic per-conversation attribute frame derived from the
    conversation id (the sandbox has no patient table; real deployments
    join their own (key, weight_kg, height_cm, sex) dimension instead).
    weight 50..99 kg, height 150..189 cm, sex cycling M/F/O. The id is
    the numeric suffix of the key (engine-portable — the DuckDB oracle
    replays the same parse; a murmur hash would not replay)."""
    uid = F.abs(F.expr(f"CAST(regexp_replace({key}, '[^0-9]', '') AS BIGINT)"))
    return turns.select(key).distinct().select(
        key,
        (50.0 + (uid % 50).cast("double")).alias("weight_kg"),
        (150.0 + (uid % 40).cast("double")).alias("height_cm"),
        F.element_at(F.lit(["M", "F", "O"]), (uid % 3).cast("int") + 1).alias("sex"),
    )


def _by_sex(sex: Column, male: Column, female: Column) -> Column:
    """M/F pick with the reference's 'O' = mean-of-both rule
    (pet_suv.py:90-97)."""
    return (
        F.when(sex == "M", male)
        .when(sex == "F", female)
        .otherwise(0.5 * (male + female))
    )


def with_suv_factors(attrs: DataFrame) -> DataFrame:
    """Attach every supported normalization factor to an attribute frame
    with (weight_kg, height_cm, sex) columns. Formula parity, one per
    reference function:

    * f_bw       — body weight (pet_suv.py:173-206 BW branch)
    * f_bsa      — Du Bois BSA, 0.007184 * h^0.725 * w^0.425 (:58-63)
    * f_lbm      — Morgan LBM (:82-102)
    * f_lbm128   — James/Morgan-128 LBM (:104-126)
    * f_janma    — Janmahasatian LBM via BMI (:128-148)
    * f_ibw      — ideal body weight (:150-170)
    """
    w, h, sex = F.col("weight_kg"), F.col("height_cm"), F.col("sex")
    woh2 = F.pow(w / h, F.lit(2.0))
    bmi = w / F.pow(h * F.lit(1e-2), F.lit(2.0))
    return attrs.select(
        "*",
        w.alias("f_bw"),
        (F.lit(0.007184) * F.pow(h, F.lit(0.725)) * F.pow(w, F.lit(0.425))).alias("f_bsa"),
        _by_sex(sex, 1.10 * w - 120.0 * woh2, 1.07 * w - 148.0 * woh2).alias("f_lbm"),
        _by_sex(sex, 1.10 * w - 128.0 * woh2, 1.07 * w - 148.0 * woh2).alias("f_lbm128"),
        _by_sex(
            sex,
            9270.0 * w / (6680.0 + 216.0 * bmi),
            9270.0 * w / (8780.0 + 244.0 * bmi),
        ).alias("f_janma"),
        _by_sex(
            sex, 48.0 + 1.06 * (h - 152.0), 45.5 + 0.91 * (h - 152.0)
        ).alias("f_ibw"),
    )
