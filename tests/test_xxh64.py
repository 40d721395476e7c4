"""The pure-Python XXH64 (tools/xxh64.py) must match Spark's JVM xxhash64.

This independence is what makes the udf-oracles a real check: the
engine side uses the JVM primitive, the oracle side this from-spec
reimplementation — agreement on the full pipelines means neither is
trusted blindly.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.xxh64 import spark_xxhash64_longs, spark_xxhash64_str  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_string_hashes_match_jvm(spark):
    # every length class of the algorithm: empty, <4, <8, 8, <32, 32, >32
    strs = ["", "a", "abc", "1234567", "12345678", "x" * 31, "y" * 32, "z" * 100,
            "héllo wörld ünïcode", "the quick brown fox jumps over the lazy dog"]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert spark_xxhash64_str(r.s) == r.h, repr(r.s)


def test_chained_long_hashes_match_jvm(spark):
    rows = [(0, 1, 2, 3), (42, -7, 123456789012345, -987654321),
            (-1, -1, -1, -1), (2**31 - 1, 2**62, -(2**63), 17)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long").select(
        "a", "b", "c", "d", F.xxhash64("a", "b", "c", "d").alias("h")
    )
    for r in df.collect():
        assert spark_xxhash64_longs(r.a, r.b, r.c, r.d) == r.h


def test_corpus_tokens_match_jvm(spark):
    # real corpus tokens, not synthetic strings
    from mr_python_spark.functions.text import tokens_col
    from mr_python_spark.session import load_table

    docs = load_table(spark, SF, "documents").limit(20)
    toks = docs.select(F.explode(tokens_col()).alias("t")).distinct().select(
        "t", F.xxhash64("t").alias("h")
    )
    rows = toks.collect()
    assert rows
    for r in rows:
        assert spark_xxhash64_str(r.t) == r.h, repr(r.t)


@pytest.mark.parametrize(
    "name", ["dedup_minhash_lsh", "dedup_simhash", "doc_fingerprint", "dedup_embedding_lsh"]
)
def test_udf_oracles_match_engine(spark, name):
    import duckdb

    from tools.check_correctness import TABLES, compare
    from tools.udf_oracles import register_udfs, udf_oracles

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    register_udfs(con)
    spark_pdf = entrymod.queries()[name](spark, SF).toPandas()
    duck_pdf = con.sql(udf_oracles()[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems
