"""Spark 4 Python Data Source API: a custom batch source, end to end.

The reference's only "source" is whatever iterable the caller passes
(tinymr.py:156; docs demo ``open()`` on text files, docs.rst:343-347).
Spark 4 generalizes that idea properly: a pure-Python ``DataSource``
declares a schema, plans ``InputPartition``s, and yields rows per
partition on executors — the modern equivalent of handing the engine a
custom iterable, but distributed, schema'd, and optimizer-visible.

``CalendarDataSource`` generates one row per day of a date range, one
input partition per YEAR (so the scan parallelizes and the partition
planning path is actually exercised), entirely deterministically —
which is what makes it DuckDB-oracle-able (``generate_series``).

Scale notes: generator sources like this are how big pipelines
materialize dimension frames (calendars, buckets, key ranges) without
shipping files; each partition yields independently on its executor,
so the source scales with partition count like any scan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from mr_python_spark.registry import register


class _YearPartition(InputPartition):
    def __init__(self, year: int):
        self.year = year


class CalendarReader(DataSourceReader):
    def __init__(self, options):
        self.start = dt.date.fromisoformat(options.get("start", "1995-01-01"))
        self.end = dt.date.fromisoformat(options.get("end", "1996-12-31"))

    def partitions(self):
        return [
            _YearPartition(y) for y in range(self.start.year, self.end.year + 1)
        ]

    def read(self, partition: _YearPartition):
        d = max(self.start, dt.date(partition.year, 1, 1))
        stop = min(self.end, dt.date(partition.year, 12, 31))
        one = dt.timedelta(days=1)
        while d <= stop:
            # (day-iso, year, month, iso weekday 1=Mon..7=Sun)
            yield (d.isoformat(), d.year, d.month, d.isoweekday())
            d += one


class CalendarDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pycalendar"

    def schema(self) -> str:
        return "day string, year int, month int, isodow int"

    def reader(self, schema):
        return CalendarReader(self.options)


_registered = False


def calendar_frame(spark: SparkSession, start: str, end: str) -> DataFrame:
    """The custom source as a DataFrame (registers it once per session)."""
    global _registered
    if not _registered:
        spark.dataSource.register(CalendarDataSource)
        _registered = True
    return (
        spark.read.format("pycalendar").option("start", start).option("end", end).load()
    )


_PYDS_ORACLE = """
SELECT
  EXTRACT(year FROM d)::INT AS year,
  EXTRACT(month FROM d)::INT AS month,
  COUNT(*) AS n_days,
  CAST(SUM(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
FROM generate_series(DATE '1995-01-01', DATE '1996-12-31', INTERVAL 1 DAY) t(d)
GROUP BY 1, 2
"""


@register("pyds_calendar_scan", _PYDS_ORACLE)
def pyds_calendar_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python Data Source: days + weekend days
    per (year, month).  The scan itself runs the DataSource API's full
    path — registration, schema, per-year partition planning, and
    executor-side row generation."""
    cal = calendar_frame(spark, "1995-01-01", "1996-12-31")
    return cal.groupBy("year", "month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("isodow") >= 6, 1).otherwise(0)).alias("n_weekend"),
    )
