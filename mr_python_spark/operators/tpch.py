"""TPC-H-shaped analytical queries adapted to the driver's star schema.

The reference has no joins or multi-table queries at all (SURVEY.md
§2c: users would hand-write reduce-side joins inside mapper/reducer);
these queries are the capability layer's proof that the classic
warehouse workload is expressible and fast.  q1/q3/q5 live in
:mod:`mr_python_spark.operators.aggregates` / ``joins``; this module
adds the q4/q6/q10/q14/q18 shapes (adapted: the synthetic schema has
no partsupp/shipmode/commitdate, so predicates use the columns that
exist — FIXTURES.md §2).

Scale notes (100 TB posture):

* q6 is the pure scan benchmark: predicate + projection pushdown means
  the scan reads 4 columns and skips row groups by ``l_shipdate``
  min/max stats — I/O-bound, no shuffle at all.
* q4 is a semi join: EXISTS never materializes the probe side's
  matches, and Spark plans a left-semi hash join with only the
  (orderkey) key shuffled.
* q10/q18 shuffle lineitem once on its natural key (l_orderkey).  At
  100 TB the orders⋈lineitem join wants both sides bucketed by
  orderkey (see docs/SCALE.md); the plan here is the AQE-friendly
  shape.
* Broadcast-hint policy: ONLY constant-size dims (region: 5 rows,
  nation: 25 rows — fixed at every scale factor) get ``F.broadcast``.
  customer/supplier/part grow linearly with SF, so their joins are
  left to stats + AQE — broadcast at small SF, shuffle join at
  100 TB.  A forced hint overrides the size check and OOMs executors
  at scale; tools/explain_audit.py forbids it (with
  autoBroadcastJoinThreshold=-1 these plans must show no broadcast
  beyond the hinted constant dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.operators.aggregates import dec_sum, dec_sum_expr
from mr_python_spark.registry import register
from mr_python_spark.session import load_table


_Q6_ORACLE = """
SELECT
  CAST(SUM(CAST(round((l_extendedprice * l_discount) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+aggregate — the scan-throughput query.

    No join, no grouping: Catalyst pushes all three predicates into the
    parquet scan (row-group skipping on l_shipdate) and reads exactly
    four columns; the aggregate is a single partial+final pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum_expr(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count by priority.

    (Adapted: no l_commitdate/l_receiptdate in the synthetic schema;
    the EXISTS predicate is ``l_shipdate > o_orderdate``.)  The semi
    join shuffles only the join key + predicate columns and stops
    probing an order at its first matching lineitem.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


_Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  n_name,
  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns.

    lineitem is filtered on l_returnflag at the scan, then shuffled
    once on l_orderkey to meet orders; nation (25 rows, constant) is
    broadcast-hinted, customer's strategy is stats/AQE-driven (it
    scales with SF).  The top-20 is TakeOrderedAndProject (no global
    sort), tie-broken on c_custkey so the limit is deterministic.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            dec_sum_expr(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q14_ORACLE = """
SELECT
  100.0 * (
    CAST(SUM(CAST(round(
      CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0
  ) / (
    CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0
  ) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_revenue", _Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one ship month.

    part scales with SF, so no forced broadcast — at small SF stats
    pick a broadcast join (no lineitem shuffle); at 100 TB AQE plans
    a shuffle join.  Both sums use exact fixed-point accumulation, so
    the final ratio is one IEEE division on identical operands in any
    engine, any partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_price = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dec_sum_expr(promo_price)
                / dec_sum_expr(disc_price)
            ).alias("promo_pct")
        )
    )


_Q7_ORACLE = """
SELECT
  sn.n_name AS supp_nation,
  cn.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, CAST(EXTRACT(year FROM l_shipdate) AS INTEGER)
"""


@register("q7_nation_volume", _Q7_ORACLE)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume per year.

    Five joins, but lineitem shuffles exactly once (onto orders); the
    two nation aliases (constant 25 rows) are broadcast-hinted, while
    supplier/customer (SF-scaling) are stats/AQE-planned.  The
    nation-pair inequality is a cheap post-join filter, not a join
    condition blowup.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            dec_sum_expr(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


_PIPELINE_ORACLE = """
WITH spend AS (
  SELECT
    o_custkey,
    SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS total_fp
  FROM orders
  GROUP BY o_custkey
)
SELECT
  CASE
    WHEN total_fp < 50000000  THEN 'low'
    WHEN total_fp < 200000000 THEN 'mid'
    ELSE 'high'
  END AS band,
  COUNT(*) AS n_customers,
  CAST(SUM(total_fp) AS DOUBLE) / 100.0 AS band_total
FROM spend
GROUP BY 1
"""


@register("pipeline_rekey_bands", _PIPELINE_ORACLE)
def pipeline_rekey_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage re-keyed pipeline — the reference's signature shape.

    A tinymr user writes this as reducer-emits-new-key (stage 1 keyed
    by customer, stage 2 keyed by spending band; tinymr.py:218-221 runs
    the second shuffle for exactly this).  As DataFrames it is two
    chained aggregations: Catalyst plans two shuffles, each with
    map-side partial aggregation, and the second keys on 3 values.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("total_fp")
    )
    band = (
        F.when(F.col("total_fp") < 50_000_000, "low")
        .when(F.col("total_fp") < 200_000_000, "mid")
        .otherwise("high")
    )
    return (
        spend.select(band.alias("band"), "total_fp")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("total_fp").cast("double") / 100.0).alias("band_total"),
        )
    )


_Q18_ORACLE = """
SELECT
  c_custkey,
  c_name,
  o_orderkey,
  o_orderdate,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 30000
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("q18_large_volume", _Q18_ORACLE)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (HAVING over a grouped sum).

    The quantity rollup groups lineitem on its natural key
    (l_orderkey) — co-partitioned with the orders join that follows,
    so AQE reuses one shuffle for both; customer (SF-scaling) joins
    by stats/AQE choice, not a forced hint.  The HAVING predicate
    compares exact fixed-point longs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    qty = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("qty_fp")
    ).filter(F.col("qty_fp") > 30000)
    return (
        qty.join(orders, qty.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("qty_fp").cast("double") / 100.0).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q13_ORACLE = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY n_orders
"""


@register("q13_customer_distribution", _Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count distribution over customers.

    The join predicate carries the non-key filter (a left join must
    keep the customer row even when every order is filtered out, so
    the filter CANNOT be a WHERE).  Two chained aggregations: the
    first on the shuffled join key, the second on the tiny count
    domain — the classic re-key funnel the reference expresses as a
    second partition+sort (tinymr.py:218-221).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


_Q15_ORACLE = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS total_fp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_fp AS DOUBLE) / 1000000.0 AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_fp = (SELECT MAX(total_fp) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The max is matched on the exact fixed-point long (never a float
    equality).  Plan shape: one shuffle to build per-supplier revenue,
    a scalar-subquery max over that (tiny) aggregate, and a join back
    to supplier — lineitem is read once.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 1_000_000, 0).cast("long")
        ).alias("total_fp")
    )
    best = revenue.agg(F.max("total_fp").alias("best_fp"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(best), F.col("total_fp") == F.col("best_fp"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_fp").cast("double") / 1_000_000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_Q17_ORACLE = """
WITH avg_qty AS (
  SELECT
    l_partkey,
    0.2 * (CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
           / CAST(COUNT(*) AS DOUBLE)) AS threshold
  FROM lineitem
  GROUP BY l_partkey
)
SELECT
  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON avg_qty.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < threshold
"""


@register("q17_small_quantity", _Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually small orders of a brand.

    The per-part average is the correlated subquery of the spec,
    expressed as a grouped aggregate joined back on partkey — one
    lineitem shuffle builds it, and at scale both sides of that join
    arrive already partitioned by l_partkey so AQE reuses the
    exchange.  The threshold (0.2 × mean) is one multiply on a
    decimal-sum-derived mean: bit-identical across engines.

    The brand filter pushes BELOW the rollup as a left-semi join (the
    round-16 q2 lesson): the per-part mean is independent of every
    other part, so the threshold aggregate hashes only the brand
    slice instead of the corpus — at 100 TB the difference between
    aggregating everything and aggregating ~1/brand-cardinality of it
    (measured 0.55–0.73s vs 0.59–0.97s at sf0.1, identical output).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li3 = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    avg_qty = li3.groupBy(F.col("l_partkey").alias("ak")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).cast("double")
                / 100.0
                / F.count(F.lit(1)).cast("double")
            )
        ).alias("threshold")
    )
    return (
        li3.join(part, li3.l_partkey == part.p_partkey)
        .join(avg_qty, li3.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).cast("double")
                / 100.0
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q19_ORACLE = """
SELECT
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
"""


@register("q19_disjunctive_revenue", _Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand/size/quantity ranges.

    The OR-of-ANDs predicate references BOTH sides, so it cannot be
    pushed below the join — but the join itself stays a plain equi
    hash join on partkey with the disjunction as a post-join filter
    (never a nested-loop over the predicate).  Catalyst pushes the
    derivable single-side bounds (quantity envelope, size envelope)
    down to the scans.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disj = (
        ((b == "Brand#1") & s.between(1, 15) & (q >= 1) & (q <= 21))
        | ((b == "Brand#2") & s.between(10, 30) & (q >= 10) & (q <= 30))
        | ((b == "Brand#3") & s.between(20, 50) & (q >= 20) & (q <= 40))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(disj)
        .agg(
            dec_sum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
