"""Set operations: union / intersect / except.

ABSENT from the reference (input concatenation is the caller's job,
SURVEY.md §2c).  Native here; all three shuffle on the full row as the
key, so project to the minimal column set first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.registry import register
from mr_python_spark.session import load_table


_UNION_ORACLE = """
SELECT nationkey, COUNT(*) AS n_accounts
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
GROUP BY nationkey
"""


@register("setop_union_all", _UNION_ORACLE)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two keyed streams + count (no dedup shuffle)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    unioned = customer.select(F.col("c_nationkey").alias("nationkey")).unionByName(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
    return unioned.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_accounts"))


_INTERSECT_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("setop_intersect", _INTERSECT_ORACLE)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""


@register("setop_except", _EXCEPT_ORACLE)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): customers who ordered but
    never placed a large order.  ``subtract`` = SQL EXCEPT; the
    multiset variant is ``exceptAll``."""
    orders = load_table(spark, sf_dir, "orders")
    all_cust = orders.select(F.col("o_custkey").alias("custkey"))
    big_cust = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return all_cust.subtract(big_cust)


_UNION_DISTINCT_ORACLE = """
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


@register("setop_union_distinct", _UNION_DISTINCT_ORACLE)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union + dedup in one hash-aggregate shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .unionByName(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


_INTERSECT_ALL_ORACLE = """
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


@register("setop_intersect_all", _INTERSECT_ALL_ORACLE)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: min(multiplicity) copies survive.

    Unlike plain INTERSECT, duplicates are preserved up to the
    smaller side's count; Spark plans it as a counted aggregate +
    generate, never a join explosion.
    """
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.intersectAll(supplier)


_EXCEPT_ALL_ORACLE = """
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


@register("setop_except_all", _EXCEPT_ALL_ORACLE)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: multiplicities subtract."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.exceptAll(supplier)


# --- schema-evolution union (unionByName, allowMissingColumns) ----------

_UNION_BY_NAME_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
), v2 AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 2 = 1
), u AS (
  SELECT * FROM v1 UNION ALL BY NAME SELECT * FROM v2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_from_v1,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_price
FROM u
"""


@register("union_by_name_evolution", _UNION_BY_NAME_ORACLE)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level schema evolution: ``unionByName(...,
    allowMissingColumns=True)`` across two generations of a feed.

    The batch counterpart of schema_evolution_read: generation 1
    lacks a column generation 2 added, and their column ORDERS differ
    — positional UNION would silently mis-align, by-name union is the
    correct tool (DuckDB spells the identical semantics UNION ALL BY
    NAME).  Missing columns land as NULLs; the aggregate pins row
    provenance (NULL-priority rows ≡ v1) and an exact fixed-point
    price total over the merged frame.

    Scale: the union is a plan concatenation (no shuffle of its own);
    one map-side-combined aggregate follows.
    """
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    from mr_python_spark.operators.aggregates import dec_sum

    return u.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias("n_from_v1"),
        dec_sum("o_totalprice").alias("sum_price"),
    )
