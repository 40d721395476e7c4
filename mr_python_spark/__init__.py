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

import importlib.metadata

from mr_python_spark.core import ElementCountError, MapReduce
from mr_python_spark.session import get_spark

try:
    # Like the reference (tinymr.py:17-24): the version is package
    # metadata when installed, a fallback literal when the repo is
    # used directly off the filesystem (sys.path / PYTHONPATH).
    __version__ = importlib.metadata.version("mr-python-spark")
except importlib.metadata.PackageNotFoundError:  # pragma: no cover
    __version__ = "0.2.0"

__all__ = ["MapReduce", "ElementCountError", "get_spark", "__version__"]
