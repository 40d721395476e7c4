"""Bucketed storage layout: the shuffle-free fact-fact join.

At 100 TB the orders⋈lineitem join is the engine's largest shuffle —
both sides move once over the network on every query that joins them.
The storage-side fix is bucketing: write both tables hash-bucketed on
the join key, and every subsequent join (and any aggregate grouped on
that key) reads co-located buckets with NO exchange at all.  This
module demonstrates exactly that: the audit-visible plan property is
``Bucketed: true`` scans feeding a SortMergeJoin with no
``Exchange hashpartitioning`` between them.

The bucketed copies are written once per (sf, process) into the local
warehouse — standing in for the one-time backfill a production
deployment would run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.operators.aggregates import dec_sum_expr
from mr_python_spark.registry import register
from mr_python_spark.session import load_table

_N_BUCKETS = 8


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Ensure bucketed copies of orders/lineitem exist for this sf."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    o_name, l_name = f"orders_b_{tag}", f"lineitem_b_{tag}"
    catalog = spark.catalog
    # the in-memory catalog is per-process but the warehouse dir is
    # not: clear stale locations left by earlier processes
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    for name in (o_name, l_name):
        loc = os.path.join(warehouse, name)
        if not catalog.tableExists(name) and os.path.exists(loc):
            import shutil

            shutil.rmtree(loc)
    # repartition on the bucket column with #partitions == #buckets
    # BEFORE the bucketed write: repartition and bucketing share the
    # Murmur3 hash, so each task holds exactly one bucket and writes
    # ONE file per bucket — the condition under which Spark trusts the
    # sortBy order at read time and elides the per-side Sort under the
    # merge join (multi-file buckets are only per-file sorted, so the
    # reader would have to re-sort)
    if not catalog.tableExists(o_name):
        (
            load_table(spark, sf_dir, "orders")
            .repartition(_N_BUCKETS, F.col("o_orderkey"))
            .write.bucketBy(_N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_name)
        )
    if not catalog.tableExists(l_name):
        (
            load_table(spark, sf_dir, "lineitem")
            .repartition(_N_BUCKETS, F.col("l_orderkey"))
            .write.bucketBy(_N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(l_name)
        )
    return o_name, l_name


_BUCKETED_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@register("join_bucketed_colocated", _BUCKETED_ORACLE)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem with both sides bucketed AND sorted on the join key.

    The merge hint forces the join strategy the bucketing pays for
    (locally the small sides would otherwise broadcast); the scans
    report ``Bucketed: true`` and the join runs with NO exchange and
    NO sort on either side — the scans' ``sortBy`` order is trusted
    because each bucket is exactly one file (the write repartitions on
    the bucket hash first) and
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` is enabled
    for this plan (off by default since Spark 3 because multi-file
    buckets are only per-file sorted; the single-file layout here is
    the case the knob exists for).  The conf window pins the physical
    plan the same way the bloom-filter query does — collect-style
    actions reuse it.
    """
    o_name, l_name = _bucketed_tables(spark, sf_dir)
    conf_key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        orders = spark.table(o_name).filter(F.col("o_orderstatus") == "F")
        li = spark.table(l_name)
        out = (
            orders.hint("merge")
            .join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                dec_sum_expr(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("revenue"),
            )
        )
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
