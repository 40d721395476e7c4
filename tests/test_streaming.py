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
