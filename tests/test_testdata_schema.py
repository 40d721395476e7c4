"""Schema probe against silent testdata regeneration.

Round 4 lost all 7 live-streaming queries because /root/testdata was
regenerated between rounds with ``events.ts`` stored as plain
``timestamp[us]`` (no timezone) instead of the old nano-precision
encoding — Spark 4.1.2 loads that as TIMESTAMP_NTZ, which
``withWatermark`` rejects, and nothing failed until the driver's
graded run.  These tests pin every query-visible column, over ALL
three SF dirs, to the types the oracles and the streaming layer
assume, so the next drift fails loudly in pytest.

Two layers are probed:

* the RAW parquet types (pyarrow, no Spark needed) — catches the
  regeneration itself, fast, runs even when a Spark session can't
  start;
* the LOADED Spark dtypes after :func:`load_table`'s normalization —
  the contract the queries actually run against: ``events.ts`` MUST
  come back as ``timestamp`` (watermarkable), regardless of how the
  parquet encodes it.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# Raw parquet (pyarrow) types the generators have produced so far.  A
# set means "any of these encodes the same values" — e.g. events.ts
# has shipped as both nano-int64 and naive-us, and load_table
# normalizes both; anything OUTSIDE the set is unreviewed drift.
RAW_EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[us, tz=UTC]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[us, tz=UTC]"},
    },
    "events": {
        "event_id": {"int64"},
        # both encodings seen to date; load_table normalizes either
        "ts": {"timestamp[us]", "timestamp[us, tz=UTC]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}

# Spark dtypes AFTER load_table normalization — what queries run on.
# A set means any member keeps the oracles green (NTZ vs TZ timestamps
# compare identically under the UTC session).
LOADED_EXPECTED = {
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "nation": {
        "n_nationkey": {"int"},
        "n_name": {"string"},
        "n_regionkey": {"int"},
    },
    "customer": {
        "c_custkey": {"bigint"},
        "c_name": {"string"},
        "c_nationkey": {"int"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint"},
        "s_name": {"string"},
        "s_nationkey": {"int"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp", "timestamp_ntz"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_partkey": {"bigint"},
        "l_suppkey": {"bigint"},
        "l_linenumber": {"int"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp", "timestamp_ntz"},
    },
    "events": {
        "event_id": {"bigint"},
        # HARD requirement: watermarkable.  NTZ here = round-4 break.
        "ts": {"timestamp"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>"},
        "label": {"int"},
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(RAW_EXPECTED))
def test_raw_parquet_types(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    expected = RAW_EXPECTED[table]
    assert set(got) == set(expected), (
        f"{path}: column set drifted: got {sorted(got)}, "
        f"expected {sorted(expected)}"
    )
    for col, allowed in expected.items():
        assert got[col] in allowed, (
            f"{path}: column {col!r} stored as {got[col]!r}, outside the "
            f"reviewed encodings {sorted(allowed)} — testdata was "
            "regenerated with a new physical type; re-check load_table "
            "normalization and the streaming layer before trusting oracles"
        )


@pytest.mark.parametrize("table", sorted(LOADED_EXPECTED))
def test_loaded_spark_dtypes(spark, table):
    from mr_python_spark.session import load_table

    for sf_dir in SF_DIRS:
        df = load_table(spark, sf_dir, table)
        got = dict(df.dtypes)
        expected = LOADED_EXPECTED[table]
        assert set(got) == set(expected), (
            f"{sf_dir}/{table}: columns {sorted(got)} != {sorted(expected)}"
        )
        for col, allowed in expected.items():
            assert got[col] in allowed, (
                f"{sf_dir}/{table}.{col} loads as {got[col]!r}, "
                f"expected one of {sorted(allowed)}"
            )


def test_staged_events_stream_is_watermarkable(spark):
    """The streaming source must yield a TIMESTAMP (not NTZ) ts column."""
    from mr_python_spark.streaming import staged_events_stream

    stream = staged_events_stream(spark, SF_DIRS[0])
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # withWatermark is exactly what round 4 lost; prove it resolves
    stream.withWatermark("ts", "1 hour")


def test_documents_text_is_ascii():
    """The byte-view operators (multimodal_audio_resample and kin) and
    their DuckDB oracles agree only while the corpus is pure ASCII:
    the oracles index text by CODE POINT (substr/ascii) while the
    engine reads raw UTF-8 BYTES.  Pin the invariant so a future
    fixture change points here instead of silently diverging."""
    import duckdb

    for sf_dir in SF_DIRS:
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0, (
            f"{sf_dir}: {n} non-ASCII documents — respell the byte-view "
            "oracles over encode(text) blob bytes before trusting them"
        )
