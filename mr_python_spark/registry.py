"""Query registry backing the driver contract (``__spark_entry__.py``).

Every capability-layer operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB
oracle string computing the same result.  Cross-engine determinism
rules (so the driver's order-insensitive value hash matches):

* Sums of money columns go through ``DECIMAL`` so they are exact and
  order-independent, then cast back to ``DOUBLE`` (bit-identical).
* Averages are computed as ``decimal-sum → double ÷ count`` — one IEEE
  division on identical operands.
* Every ``LIMIT``/top-k has a total ordering (unique tiebreaker).
* Integer aggregates are cast to BIGINT on the DuckDB side (its
  ``SUM(int)`` returns HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query, optionally with its DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from mr_python_spark import dedup, multimodal, similarity, sources, streaming  # noqa: F401
    from mr_python_spark.streaming import stateful  # noqa: F401
    from mr_python_spark.functions import pyudf, scalars, text, vectors  # noqa: F401
    from mr_python_spark.operators import (  # noqa: F401
        aggregates,
        bucketing,
        joins,
        parity,
        setops,
        sorting,
        stats,
        tpch,
        windows,
    )
