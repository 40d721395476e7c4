"""Capability-layer operators: aggregation, joins, windows, sorts, set ops.

The reference has no native operators in these categories — users
hand-write them inside ``mapper()``/``reducer()`` (SURVEY.md §2c).
Here each is a thin, tested, scale-first composition of DataFrame
primitives, registered in :mod:`mr_python_spark.registry`.
"""
