"""Python UDF surfaces: pandas_udf, Python UDTF, applyInPandas.

In the reference these ARE the whole engine surface: ``mapper`` is a
row→rows UDTF, ``reducer`` is a UDAF over grouped values, ``output``
a result hook (tinymr.py:39-114; SURVEY.md §2c).  The capability
layer keeps hot paths JVM-side, but exposes each Python escape hatch
as a first-class, tested operator for logic Spark genuinely can't
express:

* scalar ``pandas_udf``    — Arrow-batched columnar compute (numpy in,
  numpy out); ~10-100× over row-at-a-time ``udf``.
* Python UDTF (Spark ≥3.5) — the literal ``mapper`` contract: one
  input row, zero-to-many output rows, via ``LATERAL``.
* ``applyInPandas``        — the literal ``reducer`` contract: one
  pandas frame per key, arbitrary Python, re-keying allowed.

Scale notes (100 TB posture): all three ship data Python-side through
Arrow in ``spark.sql.execution.arrow.maxRecordsPerBatch``-sized
batches — per-batch overhead is amortized and memory is bounded.
``applyInPandas`` materializes ONE KEY's rows in one worker (same
contract as the reference's per-key value list, tinymr.py:332-334) —
keys must fit in executor memory; use salting/pre-aggregation for
heavy keys before falling back to it.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from mr_python_spark.registry import register
from mr_python_spark.session import load_table


# --------------------------------------------------------------------
# scalar pandas_udf

_PUDF_TOKENS_ORACLE = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS INTEGER) AS n_tokens
FROM documents
"""


@register("pandas_udf_token_count", _PUDF_TOKENS_ORACLE)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count via a scalar pandas_udf.

    Same answer as the JVM-side ``word_count_per_doc`` — registered
    separately to keep the Arrow batch path itself under test.
    (The udf is built lazily: pandas_udf creation requires an active
    session, so it can't happen at module import.)
    """

    @pandas_udf("int")
    def n_tokens(text: pd.Series) -> pd.Series:
        return text.str.lower().str.split().str.len().astype("int32")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens(F.col("text")).alias("n_tokens"))


# --------------------------------------------------------------------
# Python UDTF — the reference's mapper contract (1 row → 0..N rows)

_UDTF_ORACLE = """
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 15
"""


@register("udtf_word_explode", _UDTF_ORACLE)
def udtf_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through a Python UDTF (``LATERAL split_words(text)``).

    The UDTF is the exact ``mapper`` contract from the reference
    (tinymr.py:39-59: one item in, yield many tuples out) as a native
    Spark operator.  Hot-path word count stays JVM-side
    (:func:`mr_python_spark.functions.text.word_count`); this keeps
    the UDTF surface itself tested.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):  # noqa: D102 — UDTF contract
            if text is None:
                return
            for tok in text.lower().split():
                if tok:
                    yield (tok,)

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT t.word, COUNT(*) AS cnt
        FROM docs_udtf, LATERAL split_words(text) t
        GROUP BY t.word
        ORDER BY cnt DESC, t.word
        LIMIT 15
        """
    )


_UDTF_ANALYZE_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
), pos AS (
  SELECT doc_id, lang, t, generate_subscripts(t, 1) AS i FROM toks
)
SELECT lang, COUNT(*) AS n_grams, COUNT(DISTINCT t[i]) AS n_distinct_lead
FROM pos WHERE i <= len(t) - 2
GROUP BY lang
"""


@register("udtf_ngram_analyze", _UDTF_ANALYZE_ORACLE)
def udtf_ngram_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze``): schema from args.

    The UDTF's output columns (``g0..g{n-1}``) are computed at plan
    time by its static ``analyze`` method from the CONSTANT ``n``
    argument — the Spark-4 polymorphic-UDTF surface, one step past
    the fixed-schema UDTF in :func:`udtf_word_explode`.  Called with
    n=3 over documents and aggregated per language (total trigram
    rows + distinct leading token).
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class NgramCols:
        @staticmethod
        def analyze(text, n):  # noqa: D102 — UDTF analyze contract
            return AnalyzeResult(
                schema=StructType(
                    [StructField(f"g{i}", StringType()) for i in range(n.value)]
                )
            )

        def eval(self, text: str, n: int):  # noqa: D102 — UDTF contract
            if text is None:
                return
            toks = [t for t in text.lower().split() if t]
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    spark.udtf.register("ngram_cols", udtf(NgramCols))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_ngram_udtf")
    return spark.sql(
        """
        SELECT d.lang, COUNT(*) AS n_grams, COUNT(DISTINCT t.g0) AS n_distinct_lead
        FROM docs_ngram_udtf d, LATERAL ngram_cols(text, 3) t
        GROUP BY d.lang
        """
    )


_ARROW_UDF_ORACLE = """
SELECT
  p_partkey,
  CAST(length(p_name) AS INTEGER) AS name_len,
  CAST(length(p_name) - length(replace(p_name, 'a', '')) AS INTEGER) AS n_a
FROM part
"""


@register("arrow_python_udf", _ARROW_UDF_ORACLE)
def arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized plain Python UDF (Spark 4 ``useArrow=True``).

    The third Python-evaluation tier alongside row-pickled UDFs
    (never used here) and pandas UDFs: a scalar Python function whose
    input/output cross the boundary as Arrow batches.  Kept off the
    hot paths — this query exists to pin the surface; equivalent
    JVM-side expressions are what production queries use.
    """
    arrow_metrics = F.udf(
        lambda s: (len(s), s.count("a")) if s is not None else None,
        "struct<name_len:int, n_a:int>",
        useArrow=True,
    )
    part = load_table(spark, sf_dir, "part")
    return part.select("p_partkey", arrow_metrics("p_name").alias("m")).select(
        "p_partkey", "m.name_len", "m.n_a"
    )


# --------------------------------------------------------------------
# applyInPandas — the reference's reducer contract (key, values) → rows

_GROUPED_ORACLE = """
SELECT user_id, event_id, event_type, CAST(value AS DOUBLE) AS value
FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
)
WHERE rn <= 2
"""


@register("grouped_map_top2", _GROUPED_ORACLE)
def grouped_map_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-2 events via ``applyInPandas`` grouped map.

    The literal ``reducer`` contract (tinymr.py:61-91): all of one
    key's rows arrive as a single pandas frame, arbitrary Python runs,
    any rows come back.  Pure row selection (sort + head), zero float
    arithmetic → bit-exact against the window-function oracle.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(2)

    return events.groupBy("user_id").applyInPandas(top2, events.schema)


@register("grouped_map_top2_sharded", _GROUPED_ORACLE)
def grouped_map_top2_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query, sharded: the scale path for grouped-map Python.

    ``applyInPandas`` costs one Python call PER KEY — ~10k calls here,
    and the per-call overhead dominates (measured ~4× the sharded
    variant).  Sharding groups by ``hash(key) % shards`` instead: one
    call per shard, with the per-key work done by a vectorized pandas
    groupby inside.  Identical results (each key lives in exactly one
    shard), same oracle; the pattern to reach for whenever per-key
    logic is expressible over a pandas frame of many keys.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )

    def top2_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values(["value", "event_id"], ascending=[False, True])
        return ordered.groupby("user_id", sort=False).head(2)

    sharded = events.withColumn("shard", F.pmod(F.xxhash64("user_id"), F.lit(64)))
    return (
        sharded.groupBy("shard")
        .applyInPandas(
            lambda pdf: top2_shard(pdf.drop(columns=["shard"])), events.schema
        )
    )


# --------------------------------------------------------------------
# grouped-agg pandas UDF — a true UDAF (many rows -> one scalar per key)

_UDAF_ORACLE = """
SELECT
  l_returnflag,
  CAST(SUM(q * p) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) / 100.0 AS wavg_price
FROM (
  SELECT
    l_returnflag,
    CAST(round(l_quantity * 100, 0) AS BIGINT) AS q,
    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p
  FROM lineitem
)
GROUP BY l_returnflag
"""


@register("pandas_udaf_weighted_avg", _UDAF_ORACLE)
def pandas_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag via a GROUPED_AGG
    pandas UDF — the reference's ``reducer`` contract (all of one key's
    values -> one result, tinymr.py:61-91) as a registered aggregate
    usable inside ``groupBy().agg(...)`` next to built-ins.

    Determinism: inputs arrive as fixed-point longs, the UDAF sums them
    as exact int64 (products fit: q<=2^13, p<=2^23), and performs one
    float division — bit-identical to the oracle's HUGEINT-sum path.
    Scale note: GROUPED_AGG has no partial aggregation (each key's full
    column batch reaches Python); keep it for genuinely non-algebraic
    aggregates and prefer JVM built-ins otherwise — `corr_quantity_price`
    shows the decomposed-moments alternative that does combine map-side.
    """
    import numpy as np

    from mr_python_spark.operators.aggregates import fixed_point

    @pandas_udf("double")
    def wavg(q: pd.Series, p: pd.Series) -> float:
        qi = q.to_numpy(np.int64)
        pi = p.to_numpy(np.int64)
        sxy = int(np.sum(qi * pi, dtype=np.int64))
        sq = int(np.sum(qi, dtype=np.int64))
        return float(sxy) / float(sq) / 100.0

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_returnflag",
            fixed_point(F.col("l_quantity"), 2).alias("q"),
            fixed_point(F.col("l_extendedprice"), 2).alias("p"),
        )
        .groupBy("l_returnflag")
        .agg(wavg(F.col("q"), F.col("p")).alias("wavg_price"))
    )


_ARROW_GROUPED_ORACLE = """
WITH agg AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars
  FROM documents WHERE lang IS NOT NULL GROUP BY lang
)
SELECT a.lang, a.n_docs, a.total_chars, a.max_chars,
       (SELECT MIN(d.doc_id) FROM documents d
        WHERE d.lang = a.lang AND d.n_chars = a.max_chars) AS longest_doc
FROM agg a
"""


@register("arrow_grouped_map_langstats", _ARROW_GROUPED_ORACLE)
def arrow_grouped_map_langstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map through ``applyInArrow`` — per-language corpus stats
    computed by ``pyarrow.compute`` kernels on the group's Table.

    Completes the Python-eval tier matrix: scalar pandas_udf,
    GROUPED_AGG, applyInPandas, mapInPandas, mapInArrow, arrow-scalar
    UDF, UDTF — and now the Arrow GROUPED map, the no-pandas variant
    of applyInPandas (no object-column materialization; kernels run on
    columnar buffers).  Tie-break for the longest document is MIN
    doc_id, an exact integer rule.  NULL-lang rows are excluded on BOTH
    engine and oracle sides (a correlated ``d.lang = a.lang`` subquery
    never matches a NULL group, so leaving NULLs in would diverge the
    gate the moment the fixture grew one — same pinning rule as
    ``dedup_semantic_within_lang``).  Same 100 TB posture as any
    grouped map: one hash shuffle by group key, group-local compute.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter(F.col("lang").isNotNull())
    )

    def stats(table: "pa.Table") -> "pa.Table":
        nc = table.column("n_chars")
        mx = pc.max(nc)
        winner = pc.min(pc.filter(table.column("doc_id"), pc.equal(nc, mx)))
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": pa.array([table.num_rows], pa.int64()),
                "total_chars": pa.array([pc.sum(nc).as_py()], pa.int64()),
                "max_chars": pa.array([mx.as_py()], pa.int64()),
                "longest_doc": pa.array([winner.as_py()], pa.int64()),
            }
        )

    return docs.groupBy("lang").applyInArrow(
        stats,
        "lang string, n_docs bigint, total_chars bigint, "
        "max_chars bigint, longest_doc bigint",
    )
