"""Hash aggregations: group-by, distinct counts, cube/rollup/grouping sets.

The reference's only aggregation machinery is group-by-key plus a user
reducer (tinymr.py:332-334, 209-211), with map-side combining done by
hand via per-item ``Counter`` objects (docs.rst:199-276).  Catalyst
gives all of that natively: ``groupBy().agg()`` plans partial+final
``HashAggregate`` (the hand-written combiner, automatically) and AQE
coalesces post-shuffle partitions.

Scale notes (100 TB posture):

* All aggregates here are algebraic → map-side partial aggregation
  bounds shuffle volume by (#groups × #partitions), not by input rows.
* ``approx_count_distinct`` (HLL) is the scale path for distincts;
  exact ``countDistinct`` plans a two-phase expand+agg. Both offered.
* Money sums run over DECIMAL: exact, order-independent — safe under
  any partitioning — then surface as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.registry import register
from mr_python_spark.session import load_table


def fixed_point(expr_col, scale: int):
    """Round a positive double expression to ``scale`` decimals as a long.

    Computed as ``floor(x·10^s + 0.5)`` — equal to round-half-up for
    the NON-NEGATIVE inputs this helper is contracted for, but pure
    double arithmetic in codegen, where ``F.round`` allocates a
    BigDecimal per row (measured ~2.7× slower across a q1-shaped
    aggregate).  Two preconditions, both audited true for every call
    site (money/quantity/value columns and their products): inputs are
    ≥ 0 (floor(x+0.5) rounds negatives toward +inf, HALF_UP away from
    zero), and inputs are exact at ≤ ``scale`` decimals, so x·10^s
    lands within ~1e-9 of an integer — never near the .5 boundary
    where the double addition could tip the floor.  The scaled long
    stays far below 2^53, so it is bit-identical across engines and
    matches the DuckDB oracle's ``round(x·10^s, 0)``.
    """
    return F.floor(expr_col * (10**scale) + F.lit(0.5))


def dec_sum(col, scale: int = 2):
    """Exact, order-independent sum of a money-like double column.

    Fixed-point: longs sum associatively (any partitioning, any order),
    ~3× faster than Spark's decimal aggregate, and the final
    long→double conversion + one power-of-ten divide is IEEE-identical
    everywhere.  DuckDB oracle shape:
    ``CAST(SUM(CAST(round(x * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0``.
    """
    return dec_sum_expr(F.col(col), scale)


def dec_sum_expr(expr_col, scale: int = 6):
    """Exact sum of a computed double expression (micro-unit scale)."""
    return F.sum(fixed_point(expr_col, scale)).cast("double") / float(10**scale)


def dec_avg(col, scale: int = 2):
    """Deterministic average: exact fixed-point sum ÷ count."""
    return dec_sum(col, scale) / F.count(F.col(col))


_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (the flagship aggregate).

    Single scan → partial/final hash aggregate over a 6-group key
    space; shuffle volume is O(groups), independent of table size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum_expr(disc_price).alias("sum_disc_price"),
            dec_sum_expr(charge).alias("sum_charge"),
            (dec_sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (dec_sum("l_extendedprice") / F.count("l_extendedprice")).alias("avg_price"),
            (dec_sum("l_discount") / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_AGG_STATS_ORACLE = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(o_totalprice) AS avg_price
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_stats_orders", _AGG_STATS_ORACLE)
def agg_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/min/max/sum/avg per priority — the algebraic aggregate core."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dec_sum("o_totalprice").alias("sum_price"),
        dec_avg("o_totalprice").alias("avg_price"),
    )


_DISTINCT_ORACLE = """
SELECT
  event_type,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


@register("distinct_users_per_event", _DISTINCT_ORACLE)
def distinct_users_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per key — the docs.rst:389-407 ``KeyCount``
    pattern (``len(set(values))`` in a reducer) as a native aggregate.

    Scale path: swap ``countDistinct`` for ``approx_count_distinct``
    (see :func:`approx_distinct_users`) to avoid the expand shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("approx_distinct_users")  # no oracle: HLL estimates are engine-specific
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct count — the 100 TB path for distincts."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"),
    )


_ENVELOPE_ORACLE = """
SELECT
  event_type,
  COUNT(DISTINCT user_id) AS n_users_exact,
  TRUE AS approx_within_2pct
FROM events
GROUP BY event_type
"""


@register("approx_distinct_envelope", _ENVELOPE_ORACLE)
def approx_distinct_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable envelope on the HLL estimate.

    ``approx_distinct_users`` itself can only be rows-only checked
    (HLL sketches are engine-specific), so this companion makes the
    accuracy claim gateable: it emits the EXACT per-key distinct
    count (verified value-for-value against DuckDB's own exact
    count) plus a flag asserting the HLL estimate (rsd = 1%) landed
    within ±2% (2×rsd) of it.  If Spark's estimator ever drifts past
    the envelope the flag flips false and the hash compare fails.
    """
    events = load_table(spark, sf_dir, "events")
    both = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
    )
    return both.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("approx") - F.col("n_users_exact"))
            <= 0.02 * F.col("n_users_exact")
        ).alias("approx_within_2pct"),
    )


_CUBE_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_orders", _CUBE_ORACLE)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("sum_price"),
    )


_ROLLUP_ORACLE = """
SELECT
  r_name,
  n_name,
  COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("rollup_region_nation", _ROLLUP_ORACLE)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP along the region → nation hierarchy (broadcast dims)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


_GSETS_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("grouping_sets_lineitem", _GSETS_ORACLE)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (Catalyst Expand + single agg)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT
          l_returnflag,
          l_linestatus,
          COUNT(*) AS n_items,
          CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


_SCALAR_SUBQ_SQL = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_above_avg
FROM {orders}
WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > (
  SELECT SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / COUNT(*)
  FROM {orders}
)
GROUP BY o_orderpriority
"""


@register("scalar_subquery_orders", _SCALAR_SUBQ_SQL.format(orders="orders"))
def scalar_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price — scalar subquery planning.

    Catalyst executes the uncorrelated subquery once (a broadcast
    scalar), then the outer scan filters against it — two passes over
    orders, no join.  The comparison is in exact fixed-point integer
    space (bigint average, floor semantics identical in both engines),
    so the boundary rows agree bit-for-bit.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(_SCALAR_SUBQ_SQL.format(orders="orders_sq"))


_CORR_SUBQ_SQL = """
SELECT
  o_orderkey,
  o_custkey,
  CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM {orders} o
WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) * (
  SELECT COUNT(*) FROM {orders} i WHERE i.o_custkey = o.o_custkey
) > (
  SELECT SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
  FROM {orders} i WHERE i.o_custkey = o.o_custkey
)
"""


@register("correlated_subquery_orders", _CORR_SUBQ_SQL.format(orders="orders"))
def correlated_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their own customer's average — correlated subqueries.

    Catalyst decorrelates both subqueries into one aggregate-then-join
    on o_custkey (no per-row re-execution).  The predicate is written
    as ``price × n > sum`` so it stays in exact integer space — no
    division, no float boundary cases.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(_CORR_SUBQ_SQL.format(orders="orders_corr"))


_SALTED_ORACLE = """
SELECT
  l_returnflag,
  COUNT(*) AS n_items,
  CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_salted_skew", _SALTED_ORACLE)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a pathologically hot key.

    l_returnflag has 3 values across the whole table — the worst-case
    skew for a grouped aggregate: 3 reducers own everything.  The salt
    spreads phase 1 over (key, salt mod 16) so every core combines;
    phase 2 merges 16 partials per key.  Results are identical to the
    plain GROUP BY (all aggregates here are algebraic longs), which is
    exactly why the technique is safe to apply mechanically when AQE's
    automatic skew handling isn't available (e.g. pre-3.2 clusters or
    RDD pipelines).  For most workloads prefer plain groupBy: Catalyst
    partial aggregation already bounds the skew for algebraic
    aggregates; salting matters when per-key state is large
    (collect_list, exact distinct).
    """
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.select(
        "l_returnflag",
        (F.spark_partition_id() % 16).alias("salt"),
        fixed_point(F.col("l_quantity"), 2).alias("qfp"),
    )
    phase1 = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("n_part"),
        F.sum("qfp").alias("s_part"),
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("n_part").alias("n_items"),
        (F.sum("s_part").cast("double") / 100.0).alias("sum_qty"),
    )


_FILTER_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
  AND l_discount >= 0.05
  AND l_quantity > 40
"""


@register("filter_project_lineitem", _FILTER_ORACLE)
def filter_project_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushed into the parquet scan.

    ``.explain`` shows PushedFilters on l_shipdate/l_discount/l_quantity
    and a pruned ReadSchema — the I/O pattern that matters at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") > 40)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


_NOT_IN_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
"""


@register("not_in_subquery_customers", _NOT_IN_ORACLE)
def not_in_subquery_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — the null-aware anti join.

    NOT IN differs from NOT EXISTS when the subquery can yield NULL
    (one NULL makes NOT IN return no rows); Spark plans it as a
    null-aware anti join to honor that.  o_custkey is non-null here so
    results match the anti join, but the plan shape under test is the
    null-aware variant — the one users silently get from NOT IN.

    100 TB warning (the point of keeping this surface): the null-aware
    anti join has NO shuffle strategy in Spark — the subquery side is
    planner-force-broadcast at ANY threshold, so NOT IN over a
    fact-sized subquery ships the whole subquery to every executor.
    The registry-wide fact-broadcast sweep (round 15) flags exactly
    this query, and the audit records the exception explicitly
    (``accepted_fact_builds`` in tools/explain_audit.py).  Production
    rewrite when the key is provably non-null: NOT EXISTS / left-anti
    (``join_left_anti``), which shuffles both sides.
    """
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    customer.createOrReplaceTempView("_nin_customer")
    big.createOrReplaceTempView("_nin_orders")
    return customer.sparkSession.sql(
        """
        SELECT c_custkey, c_name
        FROM _nin_customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM _nin_orders)
        """
    )


_MINMAX_BY_ORACLE = """
SELECT
  o_orderpriority,
  CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
  CAST(arg_max(o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) * 8589934592 + o_orderkey) AS BIGINT) AS priciest_order,
  CAST(arg_min(o_orderkey, CAST(round(o_totalprice * 100, 0) AS BIGINT) * 8589934592 + o_orderkey) AS BIGINT) AS cheapest_order
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_minmax_by", _MINMAX_BY_ORACLE)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts + argmax/argmin aggregates per group.

    ``max_by``/``min_by`` on a bare value column is nondeterministic
    under ties, so the ordering key packs (fixed-point price,
    orderkey) into one exact bigint — a total order both engines'
    arg_max/arg_min resolve identically.  The pack is
    ``price_cents * 2^33 + o_orderkey``: a total order as long as
    o_orderkey < 2^33 (TPC-H orderkey max is 6e6 * SF, so this holds
    through SF ≈ 1400) and price_cents < 2^30 (price < $10.7M; TPC-H
    max o_totalprice ≈ $600k).  Both bounds are enforced at runtime
    via raise_error rather than silently colliding.  count_if is the
    FILTER-clause conditional count.
    """
    orders = load_table(spark, sf_dir, "orders")
    fp = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    key = F.when(
        (fp < F.lit(1 << 30)) & (F.col("o_orderkey") < F.lit(1 << 33)),
        fp * F.lit(1 << 33) + F.col("o_orderkey"),
    ).otherwise(
        F.raise_error(F.lit("agg_minmax_by: packed tiebreak key would overflow"))
    )
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.max_by(F.col("o_orderkey"), key).alias("priciest_order"),
        F.min_by(F.col("o_orderkey"), key).alias("cheapest_order"),
    )


_GROUPING_ID_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
  COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_grouping_id", _GROUPING_ID_ORACLE)
def cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping() discriminators.

    A NULL in cube output is ambiguous (real NULL vs rolled-up
    level); ``grouping()`` disambiguates.  Composed as
    grouping(a)·2 + grouping(b) rather than engine-specific
    grouping_id() so the bitmask is identical everywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    gid = (
        F.grouping("o_orderstatus").cast("long") * 2
        + F.grouping("o_orderpriority").cast("long")
    )
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        gid.alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- ordered string aggregation (Spark 4.0 listagg) ---------------------

_LISTAGG_ORACLE = """
SELECT r.r_name,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@register("listagg_regions", _LISTAGG_ORACLE)
def listagg_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation via Spark 4.0's ``listagg``.

    ``listagg(expr, sep) WITHIN GROUP (ORDER BY ...)`` landed in Spark
    4.0 (SPARK-42746) — before that, users hand-rolled
    ``array_join(array_sort(collect_list(...)))``.  The WITHIN GROUP
    ordering is what makes the result deterministic (an unordered
    listagg is partitioning-dependent and would never hash-gate);
    DuckDB states the same contract as ``string_agg(... ORDER BY)``.

    Scale: collect-to-string aggregates are safe only over bounded
    groups — here |nations| per region is schema-bounded (≤ 25).  An
    unbounded listagg over a corpus-scaling group is the same
    anti-pattern as an unpartitioned window; keep it to dimension
    rollups.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
        )
    )
