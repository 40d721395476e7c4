"""Capability-gate entries that run THROUGH the parity layer.

Everything else in ``operators/`` is Spark-first; these queries push
real table data through the reference-faithful ``MapReduce`` class
(core.py) and surface the result as a DataFrame, so the parity layer
itself sits under the driver's DuckDB correctness gate — not just its
unit tests.

Scale note: the parity layer is correctness-first by design
(groupByKey + driver collect, matching tinymr.py:156-230 semantics);
the equivalent scale-first operator is
:func:`mr_python_spark.functions.text.word_count`.  Registering both
against the same oracle documents that they agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mr_python_spark.core import MapReduce
from mr_python_spark.registry import register
from mr_python_spark.session import load_table


class _WordCount(MapReduce):
    """The reference's iconic query (docs.rst:27-34) as a subclass."""

    def mapper(self, item):
        for word in item.lower().split():
            yield word, 1

    def reducer(self, key, values):
        return key, sum(values)


_PARITY_WC_ORACLE = """
SELECT word, COUNT(*) AS cnt
FROM (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents
)
WHERE word <> ''
GROUP BY word
"""


@register("parity_word_count", _PARITY_WC_ORACLE)
def parity_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count via the ``MapReduce`` parity class over an RDD.

    The document texts stay distributed (RDD in, mapper/reducer run
    on executors); only the final word→count dict is driver-side —
    the reference's own output contract (tinymr.py:230).
    """
    docs = load_table(spark, sf_dir, "documents")
    texts = docs.select("text").rdd.map(lambda r: r[0])
    wc = _WordCount()
    wc.spark = spark  # reuse the driver-provided session
    mapping = wc(texts)
    schema = T.StructType(
        [T.StructField("word", T.StringType()), T.StructField("cnt", T.LongType())]
    )
    return spark.createDataFrame(
        [(w, int(c)) for w, c in mapping.items()], schema
    )
