"""Shared column-expression helpers with cross-engine parity contracts.

Centralizing these matters beyond tidiness: the DuckDB oracles replay
each helper's exact element-pick / fold convention, so a drift between
two copies would silently fork the engine's determinism contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def sorted_median(arr):
    """Median of an ALREADY-SORTED array column: odd length takes the
    middle element, even length the midpoint of the two middles
    ((a + b) / 2.0 — two single IEEE ops). The engine-wide median
    convention; the oracles mirror it with 1-based list picks
    (oracle_sql_defs._TS_MED)."""
    m = F.size(arr)
    mid = F.floor(m / 2).cast("int")
    return F.when(m % 2 == 1, F.get(arr, mid)).otherwise(
        (F.get(arr, mid - 1) + F.get(arr, mid)) / F.lit(2.0)
    )
