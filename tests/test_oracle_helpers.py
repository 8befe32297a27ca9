"""Unit tests for the DuckDB-side oracle helpers (no Spark needed):
the helpers themselves are gate infrastructure, so a helper that errors
on legal input would break the gate with a cast error instead of a
value mismatch."""

import math

import duckdb

import oracle_sql_defs as od


def _eval(expr_sql: str):
    return duckdb.sql(f"SELECT {expr_sql} AS v").fetchone()[0]


def test_r6x_rounds_like_spark_in_the_normal_band():
    # the documented Spark-parity case: shortest-repr ...5 at the 7th digit
    assert _eval(od.r6x("0.0634375")) == 0.063438
    assert _eval(od.r6x("-0.0")) == 0.0


def test_r6x_huge_magnitudes_do_not_overflow_the_decimal():
    # DECIMAL(38,18) holds 20 integer digits; 1e20/1e30 would raise a cast
    # error without the magnitude guard. Above 1e12 6dp rounding is the
    # identity in both engines, so the value passes through unchanged.
    for x in ("1e12", "1e20", "1e30", "-1e30", "1.7e308"):
        assert _eval(od.r6x(x)) == float(x)


def test_r6x_nonfinite_pass_through():
    assert math.isnan(_eval(od.r6x("CAST('nan' AS DOUBLE)")))
    assert _eval(od.r6x("CAST('inf' AS DOUBLE)")) == math.inf
