"""Structured Streaming parity: streaming result == batch result."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark):
    from mr_python_spark.streaming import (
        streaming_tumbling_live,
        tumbling_window_events,
    )

    batch = {
        tuple(r) for r in tumbling_window_events(spark, SF).collect()
    }
    live = {tuple(r) for r in streaming_tumbling_live(spark, SF).collect()}
    assert live == batch
    assert len(live) > 0


def test_streaming_static_enrich_matches_batch(spark):
    """Stream-static join + windowed rollup == the same plan in batch."""
    from pyspark.sql import functions as F

    from mr_python_spark.operators.aggregates import dec_sum
    from mr_python_spark.session import load_table
    from mr_python_spark.streaming import streaming_static_enrich

    tiers = {
        "click": "engagement",
        "view": "engagement",
        "signup": "conversion",
        "purchase": "conversion",
        "error": "fault",
    }
    ev = load_table(spark, SF, "events")
    rows = (
        ev.groupBy(
            F.unix_timestamp(F.window("ts", "1 hour").start).alias("win_start"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value").alias("s"))
        .collect()
    )
    # fold event_type rows up to tiers (exact decimal sums re-added)
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        key = (r.win_start, tiers[r.event_type])
        agg[key][0] += r.n
        agg[key][1] += round(r.s * 100)
    expected = {
        (w, t, n, round(c) / 100.0) for (w, t), (n, c) in agg.items()
    }
    live = {tuple(r) for r in streaming_static_enrich(spark, SF).collect()}
    assert live == expected
    assert len(live) > 0
