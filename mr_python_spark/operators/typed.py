"""Decimal- and interval-typed query surfaces.

The reference has no type system at all (tinymr keys/values are
arbitrary Python objects, tinymr.py:50-56); money math elsewhere in
this repo is exact fixed-point longs (registry.py:1-15).  These two
queries close the remaining type-surface blind spot by running Spark's
ANSI ``DecimalType`` and ``DayTimeIntervalType`` end to end as
user-visible outputs, each against a DuckDB oracle.

Cross-engine hashing notes:

* DuckDB's pandas client renders ``DECIMAL`` as float64, so a raw
  decimal column can never hash-match Spark's ``decimal.Decimal``
  objects.  The decimal query therefore computes ENTIRELY in
  ``DecimalType`` (sums stay exact; no double arithmetic anywhere) and
  surfaces each result as its exact scale-preserving string rendering
  ("3183256271.63"), identical on both engines.  A unit test pins the
  pre-render schema to ``decimal(15,2)`` / ``decimal(18,4)``.
* Day-time intervals round-trip as ``pandas.Timedelta`` on BOTH
  engines (Spark ``INTERVAL DAY TO SECOND`` and DuckDB ``INTERVAL``),
  so the interval column is surfaced as-is — the values are identical
  objects, no rendering shim needed.

Scale notes: both queries are single hash-aggregates over one scan —
partial+final aggregation, no joins beyond orders⋈lineitem on its
natural key; decimal aggregation is JVM-side (no Python), exactly as
cheap as the long-typed q1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.registry import register
from mr_python_spark.session import load_table

_DEC_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS VARCHAR) AS sum_qty_dec,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DECIMAL(15,2)) AS VARCHAR) AS sum_base_dec,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
              * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DECIMAL(18,4)) AS VARCHAR) AS sum_disc_dec,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_decimal", _DEC_ORACLE)
def q1_pricing_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape computed wholly in ``DecimalType`` — exact money math.

    Every operand is decimal before any arithmetic: quantities and
    prices as ``decimal(15,2)``, discounts as ``decimal(4,2)``, so the
    discounted-price product carries scale 4 exactly and every SUM is
    exact integer arithmetic in the JVM (no double rounding anywhere,
    unlike the fixed-point-long q1 which is exact-by-construction but
    long-typed).  Output columns are the decimals' scale-preserving
    string renderings (see module docstring for why); the decimal
    schema itself is pinned by ``tests`` via :func:`q1_decimal_plan`.
    """
    return q1_decimal_plan(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty_dec").cast("string").alias("sum_qty_dec"),
        F.col("sum_base_dec").cast("string").alias("sum_base_dec"),
        F.col("sum_disc_dec").cast("string").alias("sum_disc_dec"),
        "n_rows",
    )


def q1_decimal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decimal-typed aggregate itself (pre-string-render)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(15,2)")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(15,2)").alias("sum_qty_dec"),
            F.sum(price).cast("decimal(15,2)").alias("sum_base_dec"),
            F.sum(price * (F.lit(1) - disc)).cast("decimal(18,4)").alias("sum_disc_dec"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_IV_ORACLE = """
SELECT
  o_orderpriority,
  CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 30) AS BIGINT) AS latency_bucket,
  COUNT(*) AS n_items,
  MAX(l_shipdate - o_orderdate) AS max_latency,
  MIN(l_shipdate - o_orderdate) AS min_latency
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority, latency_bucket
"""


@register("interval_ship_latency", _IV_ORACLE)
def interval_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship-latency distribution with ``INTERVAL DAY TO SECOND`` outputs.

    Timestamp subtraction yields a day-time interval; rows bucket by
    30-day latency bands and each (priority, bucket) group reports its
    exact MAX/MIN latency as a first-class interval value — ordered
    aggregation over ANSI intervals, surfaced untranslated (both
    engines return ``pandas.Timedelta``).  One shuffle: the
    orders⋈lineitem join on the natural key, then a partial+final
    aggregate on the (priority, bucket) pair.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lat = F.col("l_shipdate") - F.col("o_orderdate")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderpriority",
            F.floor(days / 30).cast("long").alias("latency_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.max(lat).alias("max_latency"),
            F.min(lat).alias("min_latency"),
        )
    )


_SQLVAR_ORACLE = """
WITH q AS (
  SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS quota
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_big,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue,
       (SELECT quota FROM q) AS quota
FROM orders, q
WHERE o_totalprice >= quota
GROUP BY o_orderpriority
"""


@register("sql_variables_quota", _SQLVAR_ORACLE)
def sql_variables_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables + ``EXECUTE IMMEDIATE`` — the
    scripting surface: ``DECLARE VARIABLE``, ``SET VAR`` from a scalar
    subquery (the p90 order-value quota), then a parameterized
    ``EXECUTE IMMEDIATE ... USING`` query consuming the variable —
    the pattern SQL-only pipelines use for config-driven thresholds
    without string interpolation (injection-safe parameter binding).

    The quota uses ``percentile_disc`` (an actual data value, exact
    cross-engine — the doc_length_quantiles precedent); money sums go
    through the fixed-point device.  The variable round-trips through
    the session, so the oracle states the same computation with a
    plain scalar subquery.

    Scale: the quota is one TakeOrdered-class aggregate; the main
    query is one partial-agged scan with the variable folded in as a
    literal by the parser — variables add zero distributed cost.
    """
    orders = load_table(spark, sf_dir, "orders")
    view = "sqlvar_orders"
    orders.createOrReplaceTempView(view)
    spark.sql("DECLARE OR REPLACE VARIABLE mrps_quota DOUBLE DEFAULT 0.0")
    spark.sql(
        "SET VAR mrps_quota = (SELECT percentile_disc(0.9)"
        f" WITHIN GROUP (ORDER BY o_totalprice) FROM {view})"
    )
    return spark.sql(
        f"""
        EXECUTE IMMEDIATE
        'SELECT o_orderpriority,
                COUNT(*) AS n_big,
                CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS DOUBLE) / 100.0 AS revenue,
                ? AS quota
         FROM {view} WHERE o_totalprice >= ?
         GROUP BY o_orderpriority'
        USING mrps_quota, mrps_quota
        """
    )


# --- Spark 4.0 SQL pipe syntax ------------------------------------------

_PIPE_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("sql_pipe_syntax", _PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0 SQL pipe syntax (SPARK-49555): the same logical plan
    a DataFrame chain builds, written as ``FROM … |> WHERE … |>
    AGGREGATE … |> ORDER BY``.

    Pipe operators compose top-to-bottom the way transformations
    actually apply — the SQL-text counterpart of the DataFrame API,
    and new surface area in Spark 4.  The parser lowers it to the
    identical Catalyst plan as the classic form (the oracle states
    that classic form), so filters still push to the scan and the
    aggregate still splits partial/final — syntax, not semantics, is
    what this query pins.

    Money sums ride the fixed-point device; `floor(x*100 + 0.5)`
    matches DuckDB's round-half-up on these positive prices.
    """
    li = load_table(spark, sf_dir, "lineitem")
    view = "pipe_lineitem"
    li.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        FROM {view}
        |> WHERE l_quantity >= 30
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                          AS DOUBLE) / 100.0 AS revenue
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )
