"""Differential parity: the Spark engine vs the ACTUAL reference.

The property suite (test_property_parity.py) checks against an
in-process oracle implementing the DOCUMENTED semantics; this suite
removes the middleman where possible: identical task classes run
through BOTH engines — the real ``tinymr.MapReduce`` loaded from
/root/reference and our Spark-backed ``MapReduce`` — and must produce
identical output for every hypothesis example, across the
generator/return matrix, sort flags, re-keying, and exception arity.

Skipped cleanly when the reference checkout is not present (the repo
is standalone; this suite is extra evidence, not a dependency).
"""

from __future__ import annotations

import importlib.util
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

REF_PATH = "/root/reference/tinymr.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference checkout not present"
)

_ref_mod = None


def _ref():
    global _ref_mod
    if _ref_mod is None:
        spec = importlib.util.spec_from_file_location("tinymr_ref", REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _ref_mod = mod
    return _ref_mod


def _pair(spark, hooks: dict):
    """Build (reference_task, spark_task) from one shared hook dict."""
    from mr_python_spark import MapReduce as OursBase

    ref_task = type("RefTask", (_ref().MapReduce,), dict(hooks))()
    ours = type("OurTask", (OursBase,), dict(hooks))()
    ours.spark = spark
    return ref_task, ours


_TRIPLES = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-2, 2), st.integers(-5, 5)),
    min_size=1,
    max_size=20,
)
_PAIRS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-9, 9)), min_size=1, max_size=25
)
_FLAGS = st.tuples(st.booleans(), st.booleans())

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _collect_hooks(with_value: bool, reverse: bool) -> dict:
    def mapper(self, item):
        return item

    def reducer(self, key, values):
        yield key, list(values)

    return {
        "mapper": mapper,
        "reducer": reducer,
        "sort_map_with_value": with_value,
        "sort_map_reverse": reverse,
    }


@settings(**_SETTINGS)
@given(data=_TRIPLES, flags=_FLAGS)
def test_sort_matrix_matches_reference(spark, data, flags):
    """3-tuple sort modes: both engines, same values list per key."""
    ref_task, our_task = _pair(spark, _collect_hooks(*flags))
    assert our_task(data) == ref_task(iter(data))


@settings(**_SETTINGS)
@given(data=_PAIRS)
def test_return_reducer_matches_reference(spark, data):
    """Return-style reducer (scalar unwrap) + yield-style mapper."""

    def mapper(self, item):
        yield item[0], item[1]
        yield item[0] + 100, item[1] * 2

    def reducer(self, key, values):
        return key, sum(values)

    ref_task, our_task = _pair(spark, {"mapper": mapper, "reducer": reducer})
    assert our_task(data) == ref_task(iter(data))


@settings(**_SETTINGS)
@given(data=_PAIRS)
def test_rekey_collision_matches_reference(spark, data):
    """Funnel re-key: the reference's first-wins collision, bit for bit."""

    def mapper(self, item):
        return item

    def reducer(self, key, values):
        return "all", sum(values)

    ref_task, our_task = _pair(spark, {"mapper": mapper, "reducer": reducer})
    assert our_task(data) == ref_task(iter(data))


@settings(**_SETTINGS)
@given(data=_PAIRS, flags=_FLAGS)
def test_reduce_phase_sort_matches_reference(spark, data, flags):
    """Reducer emits 3-tuples → the SECOND partition+sort must agree."""
    with_value, reverse = flags

    def mapper(self, item):
        return item

    def reducer(self, key, values):
        for v in values:
            yield key % 2, -v, v

    def output(self, mapping):
        return dict(mapping)

    hooks = {
        "mapper": mapper,
        "reducer": reducer,
        "output": output,
        "sort_reduce_with_value": with_value,
        "sort_reduce_reverse": reverse,
    }
    ref_task, our_task = _pair(spark, hooks)
    assert our_task(data) == ref_task(iter(data))


@pytest.mark.parametrize("bad", [(1,), (1, 2, 3, 4)])
def test_arity_error_matches_reference(spark, bad):
    """Both engines raise ElementCountError on 1-/4-element tuples."""
    from mr_python_spark import ElementCountError as OurErr

    def mapper(self, item):
        return bad

    def reducer(self, key, values):
        return key, 0

    ref_task, our_task = _pair(spark, {"mapper": mapper, "reducer": reducer})
    with pytest.raises(_ref().ElementCountError):
        ref_task([1])
    with pytest.raises(OurErr):
        our_task([1])


@settings(**_SETTINGS)
@given(data=_PAIRS)
def test_pooled_execution_matches_reference(spark, data):
    """The caller-pooled contract (mapper_map/reducer_map): both engines
    run the SAME thread pool and must agree — including the
    generator-expansion wrapping both apply around pooled hooks."""
    from multiprocessing.dummy import Pool  # thread pool: picklability-free

    def mapper(self, item):
        yield item[0], item[1]
        yield item[0] + 50, item[1] - 1

    def reducer(self, key, values):
        return key, sum(values)

    ref_task, our_task = _pair(spark, {"mapper": mapper, "reducer": reducer})
    with Pool(4) as p1, Pool(4) as p2:
        ours = our_task(data, mapper_map=p1.map, reducer_map=p1.map)
        ref = ref_task(iter(data), mapper_map=p2.map, reducer_map=p2.map)
    assert ours == ref


def test_heterogeneous_keys_match_reference(spark):
    """Arbitrary hashable Python keys in ONE run (None, ints, tuples,
    strings) — the reason the parity layer lives on RDDs, where a
    DataFrame column could hold none of this."""

    def mapper(self, item):
        yield None, item
        yield (item % 2, "pair"), item * 2
        yield "label", -item

    def reducer(self, key, values):
        yield key, sorted(values)

    def output(self, mapping):
        return dict(mapping)

    ref_task, our_task = _pair(
        spark, {"mapper": mapper, "reducer": reducer, "output": output}
    )
    data = [3, 1, 4, 1, 5]
    assert our_task(data) == ref_task(iter(data))


def test_empty_input_matches_reference(spark):
    """Both engines raise StopIteration on empty input (the reference's
    unprotected first-tuple peek, tinymr.py:302)."""

    def mapper(self, item):
        return item

    def reducer(self, key, values):
        return key, 0

    ref_task, our_task = _pair(spark, {"mapper": mapper, "reducer": reducer})
    with pytest.raises(StopIteration):
        ref_task(iter([]))
    with pytest.raises(StopIteration):
        our_task([])


@settings(**_SETTINGS)
@given(data=_PAIRS)
def test_filtering_mapper_matches_reference(spark, data):
    """Generator mappers may yield ZERO tuples for an item (the
    documented filter idiom); both engines must agree — including the
    StopIteration when everything is filtered out."""

    def mapper(self, item):
        if item[1] % 2 != 0:
            return  # filtered: zero tuples for this item
        yield item[0], item[1]

    def reducer(self, key, values):
        return key, sum(values)

    ref_task, our_task = _pair(spark, {"mapper": mapper, "reducer": reducer})
    if any(v % 2 == 0 for _, v in data):
        assert our_task(data) == ref_task(iter(data))
    else:
        with pytest.raises(StopIteration):
            ref_task(iter(data))
        with pytest.raises(StopIteration):
            our_task(data)
