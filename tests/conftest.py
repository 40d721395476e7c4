"""Shared fixtures: one SparkSession per test run, reference-style corpus.

The text fixture + stdlib-Counter oracle mirrors the reference's test
strategy (conftest.py:10-22, test_mapreduce_concurrency.py:25-28 in
/root/reference): engine output is always compared against an
independent trivial implementation.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    # Task classes defined in test modules pickle by reference; Spark's
    # Python workers must be able to import them (and the package).
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    os.environ["PYTHONPATH"] = os.pathsep.join(
        p for p in (here, repo, os.environ.get("PYTHONPATH")) if p
    )
    from mr_python_spark.session import get_spark

    spark = get_spark("mr_python_spark-tests")
    yield spark


@pytest.fixture(scope="session")
def lines():
    return [
        "word something else",
        "else something word word",
        "mr python could be cool 1",
        "word else word",
    ]


@pytest.fixture(scope="session")
def expected_word_counts(lines):
    return dict(Counter(" ".join(lines).lower().split()))
