"""Caller-pooled execution path: the reference's concurrency matrix.

Ports /root/reference/tests/test_mapreduce_concurrency.py:31-122 — word
count under {mapper yields, returns} × {reducer yields, returns} ×
{serial, thread-pool, process-pool} phase dispatch, plus the ``map=``
default-for-both-phases kwarg (tinymr.py:156-173).  This path never
touches Spark: supplying a pool means the caller owns parallelism, so
no ``spark`` fixture is requested and no session is created.
"""

from collections import Counter
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from functools import reduce
from multiprocessing.dummy import Pool as MPThreadPool
import operator as op

import pytest

from mr_python_spark import MapReduce


class SerialPool:
    """Laziest possible pool: a generator-based ``map``."""

    def __init__(self, max_workers):
        pass

    def close(self):
        pass

    def map(self, func, sequence):
        return (func(s) for s in sequence)


POOLS = (None, SerialPool, ThreadPoolExecutor, ProcessPoolExecutor, MPThreadPool)


class WordCountYieldYield(MapReduce):
    def mapper(self, item):
        for word in item.lower().split():
            yield word, 1

    def reducer(self, key, values):
        yield key, sum(values)

    def output(self, mapping):
        return {k: v[0] for k, v in mapping.items()}


class WordCountYieldReturn(MapReduce):
    def mapper(self, item):
        for word in item.lower().split():
            yield word, 1

    def reducer(self, key, values):
        return key, sum(values)


class WordCountReturnYield(MapReduce):
    """Single-key funnel: mapper returns one Counter per line."""

    def mapper(self, item):
        return 0, Counter(item.lower().split())

    def reducer(self, key, values):
        yield key, dict(reduce(op.add, values))

    def output(self, mapping):
        return mapping[0][0]


class WordCountReturnReturn(WordCountReturnYield):
    def reducer(self, key, values):
        return key, dict(reduce(op.add, values))

    def output(self, mapping):
        return mapping[0]


TASKS = (
    WordCountYieldYield,
    WordCountYieldReturn,
    WordCountReturnYield,
    WordCountReturnReturn,
)


@pytest.mark.parametrize("task_cls", TASKS)
@pytest.mark.parametrize("pool_cls", POOLS)
def test_pooled_matrix(task_cls, pool_cls, lines, expected_word_counts, request):
    """Same pool for both phases, every task shape.

    ``pool_cls=None`` is the reference matrix's serial row; with no pool
    kwargs our pipeline runs distributed, so that row exercises the
    Spark path (session fixture needed for executor-side unpickling of
    these test classes) and the rest never start a session.
    """
    pool = None
    task = task_cls()
    try:
        mapper_map = reducer_map = None
        if pool_cls is not None:
            pool = pool_cls(2)
            mapper_map = reducer_map = pool.map
        else:
            task.spark = request.getfixturevalue("spark")
        actual = task(lines, mapper_map=mapper_map, reducer_map=reducer_map)
    finally:
        getattr(pool, "close", lambda: None)()
    assert actual == expected_word_counts


@pytest.mark.parametrize("task_cls", TASKS)
def test_map_kwarg_is_default_for_both_phases(task_cls, lines, expected_word_counts):
    """``map=`` alone pools both phases (tinymr.py:156-173)."""
    calls = []

    def counting_map(func, sequence):
        calls.append(func)
        return [func(s) for s in sequence]

    actual = task_cls()(lines, map=counting_map)
    assert actual == expected_word_counts
    # one dispatch per phase, both through the supplied callable
    assert len(calls) == 2


def test_phase_kwargs_override_map(lines, expected_word_counts):
    """``mapper_map`` / ``reducer_map`` take precedence over ``map=``."""
    used = []

    def phase_map(tag):
        def _map(func, sequence):
            used.append(tag)
            return [func(s) for s in sequence]

        return _map

    actual = WordCountYieldReturn()(
        lines,
        map=phase_map("default"),
        mapper_map=phase_map("map-phase"),
        reducer_map=phase_map("reduce-phase"),
    )
    assert actual == expected_word_counts
    assert used == ["map-phase", "reduce-phase"]


def test_map_kwarg_with_one_override(lines, expected_word_counts):
    """``map=`` fills whichever phase kwarg is absent."""
    used = []

    def phase_map(tag):
        def _map(func, sequence):
            used.append(tag)
            return [func(s) for s in sequence]

        return _map

    actual = WordCountYieldYield()(
        lines, map=phase_map("default"), reducer_map=phase_map("reduce-phase")
    )
    assert actual == expected_word_counts
    assert used == ["default", "reduce-phase"]


def test_pooled_secondary_sort(lines):
    """3-tuple sort semantics survive the pooled path (mode table parity)."""

    class TopWord(MapReduce):
        sort_map_reverse = True

        def mapper(self, item):
            for word in item.lower().split():
                # sort element = word length, descending
                yield 1, len(word), word

        def reducer(self, key, values):
            return key, values[0]

    with ThreadPoolExecutor(2) as pool:
        result = TopWord()(lines, map=pool.map)
    longest = max(len(w) for w in " ".join(lines).lower().split())
    assert len(result[1]) == longest


def test_pooled_empty_input_raises():
    with pytest.raises(StopIteration):
        WordCountYieldReturn()([], map=map)


def test_pooled_arity_error(lines):
    class Bad(MapReduce):
        def mapper(self, item):
            yield 1, 2, 3, 4

        def reducer(self, key, values):
            return key, values

    from mr_python_spark import ElementCountError

    with pytest.raises(ElementCountError):
        Bad()(lines, map=map)
