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
    """transformWithStateInPandas variant is ALWAYS registered and must
    match the legacy applyInPandasWithState sessionizer: via the real
    TWS path when protobuf is available, via the documented guarded
    fallback (same semantics through applyInPandasWithState) when the
    environment lacks protobuf."""
    from mr_python_spark.registry import QUERIES, load_all_modules
    from mr_python_spark.streaming.stateful import (
        streaming_sessions_tws,
        streaming_stateful_sessions,
    )

    load_all_modules()
    assert "streaming_sessions_tws" in QUERIES
    new = {tuple(r) for r in streaming_sessions_tws(spark, SF).collect()}
    old = {tuple(r) for r in streaming_stateful_sessions(spark, SF).collect()}
    assert new == old and len(new) > 0


def test_sentinel_staging_int64_ts(spark, tmp_path):
    """The watermark-sentinel builder must survive events.ts regenerating
    as int64 (epoch nanos): datetime arithmetic on an int max would
    raise TypeError.  Verifies the sentinel file is written with
    far-future int values and the staged stream still yields a
    watermarkable timestamp column."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mr_python_spark.streaming import staged_events_stream

    base = 1_700_000_000 * 1_000_000_000  # epoch ns
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array(
                [base, base + 10**9, base + 2 * 10**9], type=pa.int64()
            ),
            "user_id": pa.array([10, 11, 12], type=pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    sf_dir = tmp_path / "sfint"
    sf_dir.mkdir()
    pq.write_table(t, str(sf_dir / "events.parquet"))
    stream = staged_events_stream(spark, str(sf_dir), watermark_sentinel=True)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    stage_dirs = glob.glob(
        os.path.join(__import__("tempfile").gettempdir(), "mrps_stream_sent_sfint_*")
    )
    assert stage_dirs, "sentinel stage dir not created"
    sent = pq.read_table(os.path.join(stage_dirs[0], "events_sentinel.parquet"))
    assert pa.types.is_integer(sent.schema.field("ts").type)
    assert min(sent["ts"].to_pylist()) > base + 2 * 10**9


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


def test_incremental_mv_recovers_from_mid_stream_kill(spark, tmp_path):
    """The production risk of the foreachBatch merge pattern
    (streaming_incremental_mv): a query KILLED mid-stream must, on
    restart from its checkpoint, replay only the uncommitted batch and
    converge to exactly the uninterrupted result.

    Batch 1's merge raises (simulated executor loss) AFTER batch 0
    committed its view version.  The restart must (a) not re-run the
    committed batch 0, (b) replay batch 1 under the SAME batch_id —
    which is what makes the versioned idempotent write effectively
    exactly-once — and (c) finish with a merged view bit-identical to
    a never-interrupted batch aggregate."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(["a", "b"]),
                    "v": pa.array([i * 10 + 1, i * 10 + 2], type=pa.int64()),
                }
            ),
            src / f"c{i}.parquet",
        )
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    executed: list[int] = []

    def make_merge(poison: bool):
        def merge(bdf, bid: int):
            executed.append(bid)
            if poison and bid == 1:
                raise RuntimeError("simulated mid-stream kill")
            partial = bdf.groupBy("k").agg(
                F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
            )
            prev = os.path.join(mv, f"v{bid - 1}")
            if bid > 0 and os.path.isdir(prev):
                merged = (
                    bdf.sparkSession.read.parquet(prev)
                    .unionByName(partial)
                    .groupBy("k")
                    .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                )
            else:
                merged = partial
            merged.write.mode("overwrite").parquet(os.path.join(mv, f"v{bid}"))

        return merge

    def run(poison: bool) -> None:
        stream = (
            spark.readStream.schema("k string, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(make_merge(poison))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120) or not poison
        except Exception:
            assert poison, "unpoisoned run must not fail"
        finally:
            if q.isActive:
                q.stop()

    run(poison=True)
    assert executed == [0, 1], "kill must land in batch 1, after batch 0 committed"
    assert os.path.isdir(os.path.join(mv, "v0")) and not os.path.isdir(
        os.path.join(mv, "v1")
    ), "crashed batch must not have committed its version"

    run(poison=False)
    resumed = executed[2:]
    assert resumed[0] == 1, "restart must replay the uncommitted batch id"
    assert 0 not in resumed, "committed batch 0 must not re-run"
    assert resumed[-1] == 2, "restart must drain the remaining batches"

    versions = sorted(int(d[1:]) for d in os.listdir(mv) if d.startswith("v"))
    final = {
        r.k: (r.s, r.n)
        for r in spark.read.parquet(os.path.join(mv, f"v{versions[-1]}")).collect()
    }
    expect = {
        r.k: (r.s, r.n)
        for r in spark.read.parquet(str(src))
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == expect, "recovered view must equal the uninterrupted aggregate"


def test_tick_stream_reader_replay_contract():
    """The simple stream reader's offset protocol: read() advances in
    TICKS_PER_BATCH steps, is a no-op once drained, and
    readBetweenOffsets() replays any committed range identically."""
    from mr_python_spark.sources.pyds import (
        TICKS_PER_BATCH,
        TICKS_TOTAL,
        TickStreamReader,
    )

    r = TickStreamReader()
    off = r.initialOffset()
    assert off == {"i": 0}
    seen = []
    for _ in range(TICKS_TOTAL // TICKS_PER_BATCH):
        rows, off = r.read(off)
        seen.extend(rows)
    assert off == {"i": TICKS_TOTAL}
    rows, off2 = r.read(off)  # drained: no rows, offset unchanged
    assert list(rows) == [] and off2 == off
    assert [t[0] for t in seen] == list(range(TICKS_TOTAL))
    # replay of the middle batch is identical to the original read
    replay = list(
        r.readBetweenOffsets({"i": TICKS_PER_BATCH}, {"i": 2 * TICKS_PER_BATCH})
    )
    assert replay == seen[TICKS_PER_BATCH : 2 * TICKS_PER_BATCH]


def test_streaming_cdc_apply_matches_pure_python_log_fold(spark):
    """The multi-batch foreachBatch CDC merge must equal a sequential
    in-memory fold of the full change log (base as seq-0, per-key
    max-seq wins, deletes tombstone): exercises update-override
    (%20 beats %10), insert, delete-beats-earlier-update (%130 keys),
    and untouched rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from mr_python_spark.streaming import streaming_cdc_apply

    t = pq.read_table(
        os.path.join(SF, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    ).to_pandas()
    max_key = int(t["o_orderkey"].max())
    cents = lambda p, f: float(np.floor(p * f + 0.5)) / 100.0  # noqa: E731

    snap: dict[int, tuple] = {}
    log: list[tuple[int, int, tuple | None]] = []  # (seq, key, row or None=delete)
    for r in t.itertuples(index=False):
        log.append((0, r.o_orderkey, (r.o_custkey, r.o_orderstatus, float(r.o_totalprice))))
        if r.o_orderkey % 10 == 0:
            log.append((1, r.o_orderkey, (r.o_custkey, r.o_orderstatus, cents(r.o_totalprice, 110))))
        if r.o_orderkey % 97 == 0:
            log.append((2, r.o_orderkey + max_key, (r.o_custkey, "N", float(r.o_totalprice))))
        if r.o_orderkey % 20 == 0:
            log.append((2, r.o_orderkey, (r.o_custkey, r.o_orderstatus, cents(r.o_totalprice, 120))))
        if r.o_orderkey % 13 == 0:
            log.append((3, r.o_orderkey, None))
    best: dict[int, tuple[int, tuple | None]] = {}
    for seq, key, row in log:
        if key not in best or seq > best[key][0]:
            best[key] = (seq, row)
    snap = {k: row for k, (_, row) in best.items() if row is not None}

    got = {
        r.o_orderkey: (r.o_custkey, r.o_orderstatus, r.o_totalprice)
        for r in streaming_cdc_apply(spark, SF).collect()
    }
    assert got == snap
    # the scenario must actually exercise every CDC shape, else vacuous
    assert any(k > max_key for k in snap)  # inserts landed
    # delete-beats-earlier-update: every %13 base key is gone
    assert all(k % 13 != 0 for k in got if k <= max_key)
    # override: %20 keys carry the 1.2x price, not the 1.1x one
    for r in t.itertuples(index=False):
        if r.o_orderkey % 20 == 0 and r.o_orderkey % 13 != 0:
            assert got[r.o_orderkey][2] == cents(r.o_totalprice, 120)
            break


def test_streaming_attribution_equals_batch(spark):
    """The live stateful attribution and the batch window formulation
    must agree value-for-value — the cms/streaming_cms pairing
    contract."""
    from mr_python_spark.operators.timeseries import attribution_last_touch
    from mr_python_spark.streaming.stateful import streaming_attribution_live

    sf = "/root/testdata/sf0.001"
    batch = {
        r.channel: (r.n_purchases, r.value_fp)
        for r in attribution_last_touch(spark, sf).collect()
    }
    live = {
        r.channel: (r.n_purchases, r.value_fp)
        for r in streaming_attribution_live(spark, sf).collect()
    }
    assert batch == live and batch
