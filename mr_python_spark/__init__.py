"""mr_python_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``geowurster/mr-python`` (tinymr).

Two layers:

* **Parity layer** (:mod:`mr_python_spark.core`): a Spark-backed
  :class:`MapReduce` with the reference's exact user contract
  (2/3-tuples, four sort flags, generator-vs-return semantics,
  ``output()`` hook) — see /root/reference/tinymr.py:27-230 for the
  behavior being matched (implementation here is Spark-first, not a port).
* **Capability layer** (:mod:`mr_python_spark.operators`,
  :mod:`mr_python_spark.functions`, :mod:`mr_python_spark.dedup`,
  :mod:`mr_python_spark.similarity`, :mod:`mr_python_spark.streaming`):
  the queries users express *through* mapper/reducer — grouping,
  aggregation, joins, windows, dedup, similarity search — as idiomatic
  DataFrame/SQL operators designed for 100 TB scale.
"""

from mr_python_spark.core import ElementCountError, MapReduce
from mr_python_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["MapReduce", "ElementCountError", "get_spark", "__version__"]
