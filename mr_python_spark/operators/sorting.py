"""Sorts, limits, top-k, and in-group secondary sort.

The reference sorts per-partition value lists (tinymr.py:336-343) and
does global top-k driver-side via ``Counter.most_common``
(docs.rst:57-58).  Spark equivalents:

* global top-k: ``orderBy().limit(k)`` → TakeOrderedAndProject, a
  per-partition heap + driver merge — no global sort at any scale.
* in-group ordering: ``sort_array(collect_list(struct(sort, value)))``
  for bounded groups (the direct analog of the reference's in-memory
  per-key sort), window functions for unbounded ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.registry import register
from mr_python_spark.session import load_table


_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
"""


@register("topk_orders", _TOPK_ORACLE)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject; unique tiebreaker)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


_MULTISORT_ORACLE = """
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
ORDER BY l_shipdate DESC, l_orderkey, l_linenumber
LIMIT 20
"""


@register("multisort_limit_lineitem", _MULTISORT_ORACLE)
def multisort_limit_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column lexicographic sort + limit (the (year, month)
    composite-sort pattern of test_mapreduce_sorting.py:125-167)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy(F.desc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
    )


_SECSORT_ORACLE = """
SELECT
  l_orderkey,
  ROW_NUMBER() OVER (
    PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber
  ) AS seq,
  l_linenumber,
  l_shipdate
FROM lineitem
"""


@register("secondary_sort_lineitems", _SECSORT_ORACLE)
def secondary_sort_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort inside bounded groups, tinymr-style.

    The direct Spark analog of the reference's 3-tuple
    ``(key, sort, value)`` flow: collect each order's lineitems,
    ``sort_array`` orders them by the struct's leading (sort) fields,
    then posexplode re-emits rows with their in-group sequence.  Groups
    are bounded (≤7 lineitems/order) so collect_list is safe at any
    scale; for unbounded groups use a window (see operators.windows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_shipdate", "l_linenumber"))
            ).alias("items")
        )
        .select(
            "l_orderkey",
            F.posexplode("items").alias("pos", "item"),
        )
        .select(
            "l_orderkey",
            (F.col("pos") + 1).cast("long").alias("seq"),
            F.col("item.l_linenumber").alias("l_linenumber"),
            F.col("item.l_shipdate").alias("l_shipdate"),
        )
    )


_NULLSORT_ORACLE = """
SELECT custkey, acctbal, n_orders
FROM (
  SELECT
    COALESCE(c.c_custkey, o.o_custkey) AS custkey,
    CAST(c.c_acctbal AS DOUBLE) AS acctbal,
    o.n_orders
  FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY') c
  FULL OUTER JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders WHERE o_totalprice > 350000 GROUP BY o_custkey
  ) o ON c.c_custkey = o.o_custkey
)
ORDER BY n_orders DESC NULLS LAST, custkey NULLS FIRST
LIMIT 100
"""


@register("sort_nulls_ordering", _NULLSORT_ORACLE)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST / NULLS LAST ordering over outer-join output.

    Spark's default null placement differs by direction (nulls first
    ascending, last descending) and from other engines — production
    sorts over nullable keys must pin it explicitly, so this query
    exercises both pins in one total order (the LIMIT is
    deterministic: custkey is unique and every null-extended row has
    a non-null custkey from the surviving side).
    """
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey", F.col("c_acctbal").cast("double").alias("acctbal"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = customer.join(orders, customer.c_custkey == orders.o_custkey, "full_outer")
    return (
        joined.select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "acctbal",
            "n_orders",
        )
        .orderBy(
            F.col("n_orders").desc_nulls_last(), F.col("custkey").asc_nulls_first()
        )
        .limit(100)
    )


# --- keyset-free pagination (LIMIT ... OFFSET) --------------------------

_OFFSET_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@register("paged_orders_offset", _OFFSET_ORACLE)
def paged_orders_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of the price-ranked orders: ``offset(40).limit(20)``.

    OFFSET landed in Spark 3.4; with a TOTAL order (price desc, key
    as unique tiebreaker) the page is deterministic on any engine.
    Scale note: OFFSET is shallow-page tooling — the plan still
    evaluates the global top-(offset+limit) (a 60-row
    TakeOrderedAndProject here, fine); for deep pagination use keyset
    predicates (``WHERE (price, key) < last_seen``) so the scan
    prunes instead.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(40)
        .limit(20)
    )
