"""Spark-backed parity layer for the reference's ``MapReduce`` contract.

The reference (``/root/reference/tinymr.py``) is an in-memory MapReduce:
subclass ``MapReduce``, implement ``mapper()`` / ``reducer()``, call the
instance on an iterable, get a dict back.  This module re-expresses that
contract on Spark RDDs so the same user code distributes:

* map phase        → ``rdd.flatMap`` (narrow stage)
* partition + sort → ``groupByKey`` + per-group Python sort (shuffle)
* reduce phase     → ``flatMap`` over grouped keys (narrow stage)
* second shuffle   → ``groupByKey`` again (reducers may re-key)
* output           → ``collect()`` into a dict + ``output()`` hook

Behavioral parity targets (all verified against the reference — see
SURVEY.md Appendix; citations are to /root/reference/tinymr.py):

* 2-tuple ``(key, value)`` vs 3-tuple ``(key, sort, value)`` dispatch,
  validated on the first element only (tinymr.py:301-308).
* Four sort modes from (tuple arity × ``sort_*_with_value``), each ×
  ``reverse`` — the mode table at docs.rst:300-307 / tinymr.py:316-343.
  Sorting is *stable* and the sort element is stripped before the
  reducer sees values.
* ``yield`` vs ``return`` semantics switch on whether the *subclass*
  hook is a generator function (tinymr.py:186, 198, 214, 226).
* Return-style reducers unwrap to a single value per key, first value
  wins on re-key collisions (tinymr.py:226-227).
* ``ElementCountError`` on 1- or 4-element tuples (tinymr.py:305-308);
  empty input raises ``StopIteration`` (tinymr.py:302).
* Output dict keys appear in first-appearance order of reducer output.

Scale note: this layer is **correctness-first** — ``groupByKey`` +
arbitrary Python objects is the faithful semantics, and ``collect()``
is the faithful action.  The capability layer
(:mod:`mr_python_spark.operators` and friends) is the **scale-first**
path: native DataFrame aggregates with map-side partial aggregation,
no driver materialization.
"""

from __future__ import annotations

import abc
import builtins
import itertools
from functools import partial
from inspect import isgeneratorfunction
from typing import Any, Callable, Iterable

__all__ = ["ElementCountError", "MapReduce"]


class ElementCountError(Exception):
    """Raised when a mapper/reducer tuple does not have 2 or 3 elements."""


def _emit(hook: Callable, is_gen: bool, *args):
    """Normalize a hook's output to an iterable of tuples.

    Generator hooks yield many tuples; plain hooks return exactly one
    (the reference flattens generators with ``chain.from_iterable`` and
    passes returned tuples through unchanged).
    """
    out = hook(*args)
    if is_gen:
        return out
    return (out,)


def _tag_order(rdd):
    """Attach a globally ordered id ``(partition_index, offset)`` to rows.

    Replaces the reference's implicit encounter order (it buckets into an
    insertion-ordered dict in one process) without triggering an extra
    job the way ``zipWithIndex`` would.
    """
    return rdd.mapPartitionsWithIndex(
        lambda pi, rows: (((pi, i), t) for i, t in enumerate(rows)),
        preservesPartitioning=False,
    )


def _shape_rows(tagged, has_sort: bool):
    """Reshape ``(order, tuple)`` rows to ``(key, (order, payload))``.

    When ``has_sort`` the payload is the ``(sort, value)`` tail; a stray
    2-tuple degrades to a 1-tuple tail (the reference's slice does the
    same).  When not ``has_sort`` the tuple is unpacked as exactly
    ``(key, value)`` so a stray 3-tuple raises the same ``ValueError``
    the reference hits in its partition loop.
    """
    if has_sort:

        def reshape(row):
            order, t = row
            return (t[0], (order, tuple(t[1:3])))

    else:

        def reshape(row):
            order, t = row
            key, value = t
            return (key, (order, value))

    return tagged.map(reshape)


def _sorted_group(
    entries: Iterable, has_sort: bool, sort_with_value: bool, reverse: bool
) -> tuple[Any, list]:
    """Order one key's ``(order, payload)`` entries and strip sort keys.

    Returns ``(first_appearance_order, values)``.  Encounter order is
    restored first so the subsequent mode sort is stable with respect to
    it, exactly like sorting an insertion-ordered list in one process.
    """
    entries = sorted(entries, key=lambda e: e[0])
    first_order = entries[0][0] if entries else None
    payloads = [e[1] for e in entries]

    if has_sort:
        # payload is the (sort, value) tail
        if sort_with_value:
            payloads.sort(reverse=reverse)
        else:
            payloads.sort(key=lambda p: p[0], reverse=reverse)
        values = [p[1] for p in payloads]
    elif sort_with_value:
        payloads.sort(reverse=reverse)
        values = payloads
    else:
        values = payloads
    return first_order, values


def _expand_mapper(item, mapper):
    """Run a generator mapper eagerly so a process pool can pickle it.

    Mirrors the reference's pool wrapping (tinymr.py:183-192, 233-251):
    a generator crossing a pool boundary must be materialized on the
    worker before results are serialized back.
    """
    return tuple(mapper(item))


def _expand_reducer(key_values, reducer):
    """Pool adapter for the reduce phase (tinymr.py:254-270).

    Pool ``map`` passes one argument, so the ``(key, values)`` pair
    arrives packed; materializing to a tuple is a no-op for
    return-style reducers and expands generator reducers.
    """
    return tuple(reducer(*key_values))


def _local_partition(rows: Iterable, sort_with_value: bool, reverse: bool) -> dict:
    """One in-process partition+sort phase (the pooled path's shuffle).

    Same semantics as the distributed ``_shape_rows`` + ``_sorted_group``
    pair: first-tuple-only arity validation, ``StopIteration`` on empty
    input, the four sort modes, sort element stripped before the next
    hook.  Insertion order of the returned dict is first-appearance
    order, which in one process is what the distributed path's order
    tags reconstruct.
    """
    rows = iter(rows)
    first = next(rows)  # empty input: unprotected peek, like tinymr.py:302
    if len(first) not in (2, 3):
        raise ElementCountError(
            f"Expected data of size 2 or 3, not {len(first)}. "
            f"Example: {first!r}"
        )
    has_sort = len(first) == 3
    buckets: dict[Any, list] = {}
    if has_sort:
        for t in itertools.chain((first,), rows):
            buckets.setdefault(t[0], []).append(tuple(t[1:3]))
        for tails in buckets.values():
            if sort_with_value:
                tails.sort(reverse=reverse)
            else:
                tails.sort(key=lambda p: p[0], reverse=reverse)
        return {k: [p[1] for p in tails] for k, tails in buckets.items()}
    for key, value in itertools.chain((first,), rows):
        buckets.setdefault(key, []).append(value)
    if sort_with_value:
        for values in buckets.values():
            values.sort(reverse=reverse)
    return buckets


class MapReduce(abc.ABC):
    """Distributed MapReduce with the reference's user contract.

    Subclassers implement ``mapper()`` and ``reducer()`` (each may
    ``return`` one tuple or ``yield`` many), optionally override
    ``output()`` and the four sort-flag properties, then call the
    instance on any iterable (or an existing RDD)::

        class WordCount(MapReduce):
            def mapper(self, item):
                for word in item.split():
                    yield word.lower(), 1
            def reducer(self, key, values):
                return key, sum(values)

        WordCount()(["a b a"])  # {'a': 2, 'b': 1}

    ``map`` / ``mapper_map`` / ``reducer_map`` (caller-injected
    thread/process pools in the reference; ``map`` is the default for
    both phase hooks, tinymr.py:156-173, docs.rst:309-331) select the
    **caller-pooled path**: when any is supplied, the caller owns
    parallelism, so the pipeline runs in-process dispatching each phase
    through the supplied callables — identical semantics, no Spark job.
    With none supplied, Spark owns parallelism and the pipeline runs
    distributed.
    """

    #: Optional SparkSession; resolved lazily if left None.
    spark = None

    def __getstate__(self):
        # Hooks are shipped to executors as bound methods, which pickles
        # the instance; the session is driver-only state (SPARK-5063).
        state = self.__dict__.copy()
        state.pop("spark", None)
        return state

    # -- user hooks ----------------------------------------------------

    @abc.abstractmethod
    def mapper(self, item):
        """Produce ``(key, value)`` or ``(key, sort, value)`` tuples.

        May ``return`` a single tuple or ``yield`` any number of them.
        The presence of the ``sort`` element triggers sorting before
        ``reducer()`` runs.
        """
        raise NotImplementedError  # pragma: no cover

    @abc.abstractmethod
    def reducer(self, key, values):
        """Reduce one key's values; emit tuples like ``mapper()``.

        ``values`` is a list, sorted according to the sort flags, with
        any sort elements already stripped.  May emit a different key
        than it received (re-keying).
        """
        raise NotImplementedError  # pragma: no cover

    def output(self, mapping: dict):
        """Final hook over the result dict; default is identity."""
        return mapping

    # -- sort flags (overridable as plain class attributes) ------------

    @property
    def sort_map_with_value(self) -> bool:
        """Include the value when sorting mapper output."""
        return False

    @property
    def sort_map_reverse(self) -> bool:
        """Sort mapper output descending."""
        return False

    @property
    def sort_reduce_with_value(self) -> bool:
        """Include the value when sorting reducer output."""
        return False

    @property
    def sort_reduce_reverse(self) -> bool:
        """Sort reducer output descending."""
        return False

    # -- execution -----------------------------------------------------

    def _get_spark(self):
        if self.spark is not None:
            return self.spark
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            return active
        from mr_python_spark.session import get_spark

        return get_spark()

    def _phase(self, rdd, hook_name: str, sort_with_value: bool, reverse: bool):
        """One partition-and-sort round: validate, group, order, strip.

        Returns an RDD of ``(key, (first_order, values_list))``.
        """
        tagged = _tag_order(rdd)
        tagged.cache()
        try:
            first = tagged.first()[1]
        except ValueError:
            # Empty input is unsupported, exactly like the reference's
            # unprotected peek (tinymr.py:302).
            tagged.unpersist()
            raise StopIteration(f"empty {hook_name} output")
        if len(first) not in (2, 3):
            tagged.unpersist()
            raise ElementCountError(
                f"Expected data of size 2 or 3, not {len(first)}. "
                f"Example: {first!r}"
            )
        has_sort = len(first) == 3
        keyed = _shape_rows(tagged, has_sort)
        grouped = keyed.groupByKey()
        result = grouped.mapValues(
            lambda entries: _sorted_group(entries, has_sort, sort_with_value, reverse)
        )
        return result, tagged

    def __call__(self, sequence, map=None, mapper_map=None, reducer_map=None):
        """Run the full map → shuffle → reduce → shuffle → output pipeline.

        ``map`` is the default pool for both phases; ``mapper_map`` /
        ``reducer_map`` override it per phase (tinymr.py:156-173).  Any
        of the three routes execution to the caller-pooled in-process
        path; otherwise the pipeline runs on Spark.
        """
        mapper_map = mapper_map or map
        reducer_map = reducer_map or map
        if mapper_map is not None or reducer_map is not None:
            return self._run_pooled(sequence, mapper_map, reducer_map)
        spark = self._get_spark()
        sc = spark.sparkContext

        from pyspark import RDD

        if isinstance(sequence, RDD):
            rdd = sequence
        else:
            items = list(sequence)
            rdd = sc.parallelize(items, max(1, min(len(items), sc.defaultParallelism)))

        mapper = self.mapper
        mapper_is_gen = isgeneratorfunction(mapper)
        reducer = self.reducer
        reducer_is_gen = isgeneratorfunction(reducer)

        cached = []
        try:
            mapped = rdd.flatMap(lambda item: _emit(mapper, mapper_is_gen, item))
            partitioned, c1 = self._phase(
                mapped, "mapper", self.sort_map_with_value, self.sort_map_reverse
            )
            cached.append(c1)

            # Reducer-call order must be key first-appearance order in
            # the mapped stream (the reference iterates an
            # insertion-ordered dict, tinymr.py:209-211) — observable
            # whenever reducers re-key: the FIRST reducer's output wins
            # collisions.  groupByKey yields shuffle order, so restore
            # the tag order before dispatching reducers.
            ordered = partitioned.sortBy(lambda kv: kv[1][0])
            reduced = ordered.flatMap(
                lambda kv: _emit(reducer, reducer_is_gen, kv[0], kv[1][1])
            )
            partitioned2, c2 = self._phase(
                reduced, "reducer", self.sort_reduce_with_value, self.sort_reduce_reverse
            )
            cached.append(c2)

            rows = partitioned2.collect()
        finally:
            for c in cached:
                c.unpersist()

        # Reference output order = first-appearance order of reducer
        # output keys (insertion-ordered dict in one process).
        rows.sort(key=lambda kv: kv[1][0])
        if reducer_is_gen:
            mapping = {k: values for k, (_, values) in rows}
        else:
            # Return-style reducer: single value per key; on re-key
            # collisions the first value (post-sort) wins.
            mapping = {k: values[0] for k, (_, values) in rows}
        return self.output(mapping)

    def _run_pooled(self, sequence, mapper_map, reducer_map):
        """Caller-pooled execution: the reference's concurrency contract.

        The supplied callables must be ``map()``-compatible (e.g.
        ``ProcessPoolExecutor.map``, ``multiprocessing.Pool.map``) and
        order-preserving, per the reference's documented requirement
        (docs.rst:309-331).  Each may be None, in which case that phase
        runs through ``builtins.map``.  Process pools serialize work, so
        generator hooks are expanded on the worker via the module-level
        adapters before results cross back.
        """
        mapper_is_gen = isgeneratorfunction(self.mapper)
        reducer_is_gen = isgeneratorfunction(self.reducer)

        if mapper_map is not None and mapper_is_gen:
            mapped = mapper_map(partial(_expand_mapper, mapper=self.mapper), sequence)
        else:
            mapped = (mapper_map or builtins.map)(self.mapper, sequence)
        if mapper_is_gen:
            mapped = itertools.chain.from_iterable(mapped)

        groups = _local_partition(
            mapped, self.sort_map_with_value, self.sort_map_reverse
        )

        if reducer_map is not None:
            reduced = reducer_map(
                partial(_expand_reducer, reducer=self.reducer), groups.items()
            )
        else:
            reduced = (self.reducer(k, v) for k, v in groups.items())
        if reducer_is_gen:
            reduced = itertools.chain.from_iterable(reduced)

        groups2 = _local_partition(
            reduced, self.sort_reduce_with_value, self.sort_reduce_reverse
        )
        if not reducer_is_gen:
            # Return-style reducer: unwrap; first value wins collisions.
            groups2 = {k: v[0] for k, v in groups2.items()}
        return self.output(groups2)
