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


def test_streaming_sessions_tws_gate(spark):
    """transformWithStateInPandas variant: runs (and matches the legacy
    applyInPandasWithState sessionizer) when protobuf is available;
    without it, the query is withheld from the registry and raises a
    clear ImportError instead of crashing deep inside the stream."""
    import pytest

    from mr_python_spark.registry import QUERIES, load_all_modules
    from mr_python_spark.streaming.stateful import (
        _has_protobuf,
        streaming_sessions_tws,
        streaming_stateful_sessions,
    )

    load_all_modules()
    if not _has_protobuf():
        assert "streaming_sessions_tws" not in QUERIES
        with pytest.raises(ImportError, match="protobuf"):
            streaming_sessions_tws(spark, SF)
        pytest.skip("protobuf not installed: transformWithState unavailable")
    assert "streaming_sessions_tws" in QUERIES
    new = {tuple(r) for r in streaming_sessions_tws(spark, SF).collect()}
    old = {tuple(r) for r in streaming_stateful_sessions(spark, SF).collect()}
    assert new == old and len(new) > 0


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Restarting a file-source stream from its checkpoint must process
    only NEW files — the offsets log makes replays exactly-once even
    though the source directory still contains the old data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(name, ids):
        pq.write_table(
            pa.table({"id": pa.array(ids, type=pa.int64())}), src / f"{name}.parquet"
        )

    def run_once():
        stream = spark.readStream.schema("id long").parquet(str(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    write_batch("a", [1, 2, 3])
    run_once()
    first = sorted(r.id for r in spark.read.parquet(out).collect())
    assert first == [1, 2, 3]

    write_batch("b", [4, 5])
    run_once()  # same checkpoint: file a must NOT replay
    second = sorted(r.id for r in spark.read.parquet(out).collect())
    assert second == [1, 2, 3, 4, 5]
