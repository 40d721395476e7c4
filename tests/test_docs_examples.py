"""The reference's documented examples as parity tests.

docs.rst is the reference's de-facto golden corpus (doctest-executed
in its CI; SURVEY.md §5).  Each advanced-topic example is re-run here
against the Spark-backed engine: Counter-valued single-key funnels
(docs.rst:199-276), in-mapper combining, context-manager tasks
(docs.rst:189-194), parameterized ``__init__`` (docs.rst:178-181),
and sort-flag usage — semantics, not just word counts.
"""

from __future__ import annotations

import operator as op
from collections import Counter
from functools import reduce

from mr_python_spark import MapReduce

LINES = [
    "the quick brown fox",
    "jumps over the lazy dog",
    "the fox again",
]


class _FunnelWordCount(MapReduce):
    """docs.rst:244-276 — Counter values, None-key funnel, output unwrap."""

    def mapper(self, line):
        return None, Counter(line.split())

    def reducer(self, key, values):
        return None, reduce(op.add, values)

    def output(self, mapping):
        return mapping[None]


def test_counter_funnel(spark):
    wc = _FunnelWordCount()
    wc.spark = spark
    counts = wc(LINES)
    assert isinstance(counts, Counter)
    assert counts == Counter(" ".join(LINES).split())
    assert counts.most_common(1) == [("the", 3)]


class _InMapperCombine(MapReduce):
    """docs.rst:199-243 — emit per-item pre-aggregated counts."""

    def mapper(self, line):
        return Counter(line.split()).items()

    def reducer(self, key, values):
        return key, sum(values)


def test_in_mapper_combining(spark):
    # mapper RETURNS an iterable of tuples (non-generator multi-emit):
    # the reference treats a returned items() view as one tuple per
    # element only through the generator path, so wrap in a subclass
    # that yields — matching the docs' final form.
    class Task(MapReduce):
        def mapper(self, line):
            yield from Counter(line.split()).items()

        def reducer(self, key, values):
            return key, sum(values)

    t = Task()
    t.spark = spark
    assert t(LINES) == dict(Counter(" ".join(LINES).split()))


class _ManagedTask(MapReduce):
    """docs.rst:189-194 — subclass as a context manager."""

    def __init__(self, stopwords):
        self.stopwords = set(stopwords)
        self.closed = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.closed = True

    def mapper(self, line):
        for word in line.split():
            if word not in self.stopwords:
                yield word, 1

    def reducer(self, key, values):
        return key, sum(values)


def test_context_manager_and_init_params(spark):
    with _ManagedTask(stopwords=["the", "over"]) as task:
        task.spark = spark
        counts = task(LINES)
    assert task.closed
    assert "the" not in counts
    assert counts["fox"] == 2


class _KeyCount(MapReduce):
    """docs.rst:389-407 — distinct count per key via set(values)."""

    def mapper(self, item):
        key, value = item
        return key, value

    def reducer(self, key, values):
        return key, len(set(values))


def test_keycount_distinct(spark):
    data = [("a", 1), ("a", 1), ("a", 2), ("b", 5), ("b", 5)]
    t = _KeyCount()
    t.spark = spark
    assert t(data) == {"a": 2, "b": 1}


def test_topk_most_common(spark):
    """docs.rst:57-58 — Counter.most_common over the result."""
    wc = _FunnelWordCount()
    wc.spark = spark
    top = wc(LINES).most_common(2)
    assert top[0] == ("the", 3)
    assert top[1][1] == 2  # 'fox' with 2 (ties broken by insertion)
