"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (word count over
``documents.text`` — the reference's iconic query, docs.rst:27-34) at
sf0.001.  ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the LLM-pipeline extensions; the
registry in :mod:`mr_python_spark.registry` is the single source of
truth.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from mr_python_spark import registry

registry.load_all_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mr_python_spark.functions.text import word_topk

    return word_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(registry.ORACLES)
