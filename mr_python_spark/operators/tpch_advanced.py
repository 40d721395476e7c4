"""TPC-H q2/q8/q9/q11/q12/q16/q20/q21/q22 shapes, adapted to the driver schema.

Round-3 completion of the TPC-H family (VERDICT r2 next-steps #4).
These nine exercise operator shapes the earlier set does not:
correlated min-over-dim-join (q2), CASE market-share ratios over long
join chains (q8/q9), HAVING against a scalar-subquery threshold (q11),
conditional pivot counts (q12), NOT-IN exclusion with count-distinct
(q16), nested correlated semi joins (q20), EXISTS + NOT EXISTS
double-correlation (q21), and substring bucketing with a scalar avg
subquery plus anti join (q22).

The synthetic schema (FIXTURES.md) has no ``partsupp`` table, no
l_shipmode/commitdate/receiptdate, and no c_phone, so the spec text is
adapted while keeping each query's *operator* shape intact:

* ``partsupp`` is derived where needed as the distinct
  (l_partkey, l_suppkey) relation from lineitem, with "supply cost" =
  min fixed-point unit price (q2) or shipped-quantity rollups (q20).
* "late" lineitems (q12/q21) are ``l_shipdate > o_orderdate + N days``
  instead of receipt-vs-commit comparisons.
* q22's country code is the last-two-digits bucket of ``c_name``, and
  "customers without orders" is restricted to a recent order window
  (every customer has *some* order in this dataset).

Scale notes (100 TB posture): every derived-partsupp rollup shuffles
lineitem once on (l_partkey, l_suppkey) — its natural secondary key —
then all correlation happens on the (much smaller) rollup.  The only
broadcast hints are the constant dims (region 5 rows, nation 25 rows);
part/supplier/customer joins are stats/AQE-planned, enforced by
tools/explain_audit.py under autoBroadcastJoinThreshold=-1.  q21
reuses one filtered lineitem⋈orders DataFrame for all three
correlated roles so the scan cost does not triple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mr_python_spark.operators.aggregates import dec_sum_expr
from mr_python_spark.registry import register
from mr_python_spark.session import load_table


def _ts(s: str):
    return F.lit(s + " 00:00:00").cast("timestamp")


_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(CAST(round(l_extendedprice / l_quantity * 100, 0) AS BIGINT)) AS cost_fp
  FROM lineitem GROUP BY 1, 2
)
SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey, p_type,
       CAST(ps.cost_fp AS DOUBLE) / 100.0 AS supply_cost
FROM part, ps, supplier, nation, region
WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
  AND p_size = 15 AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps.cost_fp = (
    SELECT MIN(ps2.cost_fp) FROM ps ps2, supplier s2, nation n2, region r2
    WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", _Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier per size-15 part.

    The spec's correlated min-cost subquery over a 4-way dim join.
    "Supply cost" is derived from lineitem (no partsupp table): the
    minimum fixed-point unit price each supplier ever charged for the
    part.  The correlation (min over the part's EUROPE suppliers) is a
    window min partitioned by partkey over the already-joined rollup —
    one extra shuffle on partkey, never a per-row re-scan.  region and
    nation are constant-size broadcast hints; supplier and part are
    stats/AQE-planned.

    Selective-dimension-first (the q5 lesson), taken all the way down:
    ``cost_fp`` is a per-(partkey, suppkey) min, independent of every
    other part, so the ~50×-selective ``p_size = 15`` filter pushes
    BELOW the rollup as a left-semi join on the lineitem scan — the
    aggregate then hashes ~12k rows instead of the full corpus, where
    nearly every row is a distinct (part, supplier) pair and the
    map-side partial agg collapses nothing.  Measured at sf0.1: the
    unfiltered rollup alone was ~1.2s (the whole query 1.2–1.4s); the
    semi-pushed shape runs the whole query in 0.55–0.67s with
    identical output.  The same filter joins again ABOVE the window
    for part's payload columns (an inner join on the window's own
    partition key commutes with the per-partition min), and supplier
    pre-shrinks against the EUROPE nation⋈region broadcast.  At
    100 TB the semi-push is the difference between aggregating the
    corpus and aggregating the brand slice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li15 = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    ps = li15.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0).cast("long")
        ).alias("cost_fp")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup_europe = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    europe_ps = ps.join(part, ps.l_partkey == part.p_partkey).join(
        sup_europe, ps.l_suppkey == F.col("s_suppkey")
    )
    best = F.min("cost_fp").over(Window.partitionBy("l_partkey"))
    return (
        europe_ps.withColumn("best_fp", best)
        .filter(F.col("cost_fp") == F.col("best_fp"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("cost_fp").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q8_ORACLE = """
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT) AS vol_fp,
         sn.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN vol_fp ELSE 0 END) AS DOUBLE)
    / CAST(SUM(vol_fp) AS DOUBLE) AS mkt_share
FROM vol
GROUP BY o_year
"""


@register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of AMERICA's STANDARD-part volume.

    Seven joins, one CASE-conditional ratio.  lineitem is filtered via
    the part join (p_type pushed to the part scan) and shuffles once
    per SF-scaling join; the two nation aliases and region are
    broadcast-hinted constants.  customer pre-shrinks against the
    AMERICA nation⋈region broadcast BEFORE entering the fact chain
    (the q5 selective-dimension-first lesson: Spark without CBO stats
    keeps the written join order, so the ~5× region cut must be
    applied to customer upfront, not after the orders join).
    Numerator and denominator are both fixed-point sums, so the final
    share is one IEEE division on exact operands —
    partitioning-independent.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol_fp = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000, 0
    ).cast("long")
    cust_america = customer.join(
        F.broadcast(
            cn.join(region, F.col("cn_region") == F.col("r_regionkey"))
        ),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_america, orders.o_custkey == F.col("c_custkey"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            vol_fp.alias("vol_fp"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_6", F.col("vol_fp")).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum("vol_fp").cast("double")
            ).alias("mkt_share")
        )
    )


_Q9_ORACLE = """
SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity) * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


@register("q9_product_profit", _Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on red parts by supplier nation and year.

    Long join chain with an arithmetic CASE-free profit expression.
    No partsupp, so unit cost is modeled as 0.6 × p_retailprice —
    the operator shape (scan-side LIKE filter, 4 joins, two-level
    grouping) is the spec's.  The profit amount is rounded to cents
    per row and summed as longs: exact under any partitioning, and
    the Spark expression tree mirrors the oracle's literally.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(F.round(amount * 100, 0).cast("long")).cast("double") / 100.0).alias(
                "profit"
            )
        )
    )


_Q11_ORACLE = """
WITH nat_lines AS (
  SELECT l_partkey, CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_fp
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
),
natval AS (
  SELECT l_partkey, SUM(price_fp) AS value_fp FROM nat_lines GROUP BY l_partkey
)
SELECT l_partkey AS p_key, CAST(value_fp AS DOUBLE) / 100.0 AS part_value
FROM natval
WHERE CAST(value_fp AS DOUBLE) > (SELECT CAST(SUM(price_fp) AS DOUBLE) * 0.001 FROM nat_lines)
ORDER BY part_value DESC, p_key
"""


@register("q11_important_stock", _Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts worth > 0.1% of one nation's traded value.

    HAVING against a scalar-subquery threshold.  The per-part value
    rollup is one lineitem shuffle, pre-filtered to NATION_7's
    suppliers.  The global threshold exploits sum-of-sums == direct
    sum: it is a zero-shuffle partial+final aggregate over the same
    filtered join (NOT a second copy of the per-part rollup — the
    spec's self-join trap would shuffle lineitem twice), broadcast
    back as a 1-row scalar.  The duplicated work is one extra
    2-column pruned scan, the same cost the oracle's scalar subquery
    pays.  Value is an exact fixed-point long; only the final
    threshold compare is a double.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    # selective-dimension-first (round 15): the 1/25-nation filter
    # shrinks supplier BEFORE lineitem joins, so the fact join's build
    # side is 25x smaller (and often broadcastable) instead of
    # filtering 24/25 of the join output after the fact
    nat_supp = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    nat_lines = li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey)
    value_fp = F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
    natval = nat_lines.groupBy("l_partkey").agg(value_fp.alias("value_fp"))
    threshold = nat_lines.agg(
        (value_fp.cast("double") * 0.001).alias("thresh")
    )
    return (
        natval.join(F.broadcast(threshold))
        .filter(F.col("value_fp").cast("double") > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("p_key"),
            (F.col("value_fp").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_key")
    )


_Q12_ORACLE = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_returnflag
"""


@register("q12_priority_shipping", _Q12_ORACLE)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment priority pivot.

    Conditional-count pivot (the spec's high/low line counts) over
    lines shipped >30 days after ordering in 1997.  No l_shipmode
    column, so l_returnflag stands in as the grouping dimension; no
    commit/receipt dates, so "late" is ship-vs-order lag.  The
    year-range predicate pushes to the lineitem scan; the lag
    predicate is a post-join filter (it references both sides).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_cnt", _Q16_ORACLE)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier counts per (brand, type, size).

    NOT-IN exclusion + count-distinct over the derived part-supplier
    relation (distinct (l_partkey, l_suppkey) — no partsupp table;
    negative-balance suppliers stand in for the spec's complaint
    filter).  The NOT IN is an anti join on the tiny excluded-supplier
    set (s_suppkey is never NULL, so no null-aware plan needed); the
    count-distinct rides the same shuffle as the final grouping.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, ps.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qty_fp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, SUM(qty_fp) AS tot_fp FROM shipped GROUP BY 1)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped JOIN tot USING (l_partkey)
    WHERE CAST(qty_fp AS DOUBLE) > 0.3 * CAST(tot_fp AS DOUBLE))
ORDER BY s_name
"""


@register("q20_potential_promo", _Q20_ORACLE)
def q20_potential_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers dominating a red part's 1997 volume.

    Nested correlated semi joins: supplier IN (suppliers whose 1997
    shipped quantity of some red part exceeds 30% of that part's
    total) — the spec's availqty-vs-half-shipped correlation
    re-expressed on shipped volume (no partsupp.availqty).  The red
    part filter is a semi join pushed below the rollup, so only red
    lineitems shuffle; the per-part total reuses the rollup's
    partitioning (window sum over l_partkey); the final supplier
    filter is a semi join on the tiny dominant-supplier set.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    shipped = (
        li.join(red, li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long")).alias("qty_fp"))
    )
    tot = F.sum("qty_fp").over(Window.partitionBy("l_partkey"))
    dominant = (
        shipped.withColumn("tot_fp", tot)
        .filter(F.col("qty_fp").cast("double") > 0.3 * F.col("tot_fp").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


_Q21_ORACLE = """
WITH fline AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM fline l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM fline l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM fline l3 WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("q21_suppliers_waiting", _Q21_ORACLE)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: sole-late suppliers on finalized multi-supplier orders.

    The EXISTS + NOT EXISTS double correlation: the supplier shipped
    >60 days late on an 'F' order that involved another supplier
    (EXISTS), and no *other* supplier on that order was late
    (NOT EXISTS).  One filtered lineitem⋈orders DataFrame plays all
    three correlated roles (l1/l2/l3): EXISTS becomes a left-semi
    join, NOT EXISTS a left-anti join, both on l_orderkey with the
    supplier-inequality as a join condition — all three shuffles share
    the l_orderkey partitioning so AQE reuses the exchange.  Ordering
    ties on numwait are broken by the unique s_name.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    fline = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = fline.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    l2 = fline.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    l1 = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        l1.join(supplier, l1.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


_Q22_ORACLE = """
WITH active AS (
  SELECT substring(c_name, 16, 2) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE substring(c_name, 16, 2) IN ('01','13','25','31','42','50','67')
)
SELECT cntrycode, COUNT(*) AS numcust,
  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
FROM active a
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
    FROM active WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = a.c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY cntrycode
ORDER BY cntrycode
"""


@register("q22_global_sales", _Q22_ORACLE)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average dormant accounts per name bucket.

    Substring bucketing + scalar avg subquery + anti join.  The
    "country code" is the last-two-digit bucket of c_name (no c_phone
    column), and "without orders" is restricted to orders since
    2000-01-01 (every customer here has *some* historical order).
    The average is an exact fixed-point sum ÷ count broadcast as a
    1-row scalar; the NOT EXISTS is a left-anti join against the
    date-filtered orders projection — both engines compare c_acctbal
    against a bit-identical threshold.
    """
    customer = load_table(spark, sf_dir, "customer")
    code = F.substring("c_name", 16, 2)
    active = customer.select(
        code.alias("cntrycode"), "c_acctbal", "c_custkey"
    ).filter(F.col("cntrycode").isin("01", "13", "25", "31", "42", "50", "67"))
    avg_bal = active.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).cast("double")
            / 100.0
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01")
    ).select("o_custkey")
    return (
        active.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, active.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).cast("double")
                / 100.0
            ).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
