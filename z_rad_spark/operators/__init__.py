"""Declarative DataFrame operators (the engine's relational surface).

Everything here is built from pyspark.sql built-ins so Catalyst gets full
visibility: predicate pushdown, column pruning, AQE coalescing/skew-split
all apply. No Python executes per row in any of these plans.
"""
