"""Physical-plan regression tests (no execution — plan inspection only).

Asserts the scale-critical plan properties documented in docs/SCALE.md
via tools/explain_audit.py: pushed filters, broadcast joins, partial
aggregation, TakeOrderedAndProject top-k, and the absence of
cartesian products.
"""

from __future__ import annotations

import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.explain_audit import (  # noqa: E402
    AUDITS,
    FRAME_BUILDERS,
    count_broadcast_exchanges,
    formatted_plan,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod(spark):
    import __spark_entry__ as m

    return m


@pytest.mark.parametrize("name", sorted(AUDITS))
def test_plan_properties(spark, entrymod, name):
    spec = AUDITS[name]
    fn = FRAME_BUILDERS.get(name) or entrymod.queries()[name]
    plan = formatted_plan(fn(spark, SF))
    for pat in spec.get("must", []):
        assert re.search(pat, plan), f"{name}: missing /{pat}/\n{plan}"
    for pat in spec.get("must_not", []):
        assert not re.search(pat, plan), f"{name}: forbidden /{pat}/\n{plan}"
    expected_hints = spec.get("hinted_broadcasts")
    if expected_hints is not None:
        # with stats-based broadcasting off, any BroadcastExchange left
        # is a forced hint — must equal the constant-dim hint count
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            nostats_df = fn(spark, SF)
            got = count_broadcast_exchanges(nostats_df)
            nostats = formatted_plan(nostats_df)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        assert got == expected_hints, (
            f"{name}: {got} hinted broadcasts, expected {expected_hints}\n{nostats}"
        )


def test_aqe_splits_skewed_join(spark):
    """The 100 TB skew story must actually engage: a join where one key
    holds ~90% of the left side gets its skewed partition SPLIT by AQE
    (SortMergeJoin(skew=true) + a 'coalesced and skewed' shuffle read)
    instead of stalling one task on the whole key."""
    from pyspark.sql import functions as F

    left = spark.range(400_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(50_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("w")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        j.collect()
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin(skew=true)" in plan
        assert "coalesced and skewed" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)


def test_no_top_level_complex_output_columns(spark, entrymod):
    """Driver-harness canonicalization guard: pandas ``sort_values``
    over all columns cannot hash numpy arrays, so a registered query
    returning a top-level array/map/struct column crashes the official
    grading the moment rotation reaches it (encode_tokens_to_ids, r13).
    Sequence-valued results must be projected to a scalar (CSV-join or
    digest) before registration.  Builds every registry frame lazily —
    schema only, no execution beyond what frame construction needs."""
    from pyspark.sql import types as T

    offenders = {}
    for name, fn in entrymod.queries().items():
        schema = fn(spark, SF).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex top-level output columns: {offenders}"
