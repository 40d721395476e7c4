"""Window functions: ranking, running totals, lag/lead, sliding frames.

The reference's closest construct is the secondary sort inside one
key's value list (tinymr.py:316-343) — everything beyond that (ranks,
running aggregates, access to neighboring rows) must be hand-rolled in
a reducer.  Spark's ``Window`` generalizes all of it.

Scale notes: a window = one shuffle on ``partitionBy`` + an in-partition
sort.  Rank-filter queries (top-n per key) push the limit into the
shuffle via ``WindowGroupLimit`` in recent Spark — no full sort of
losers.  Frames are streamed per partition; no group materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mr_python_spark.operators.aggregates import fixed_point
from mr_python_spark.registry import register
from mr_python_spark.session import load_table


_TOP3_ORACLE = """
SELECT * FROM (
  SELECT
    o_custkey,
    o_orderkey,
    CAST(o_totalprice AS DOUBLE) AS o_totalprice,
    ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("window_top3_per_customer", _TOP3_ORACLE)
def window_top3_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (ranking window + filter)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


_RANK_DENSE_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)       AS pr_rank,
  DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority)       AS pr_dense
FROM orders
"""


@register("window_rank_dense", _RANK_DENSE_ORACLE)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() vs dense_rank() with real ties (priority has 5 values)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("pr_rank"),
        F.dense_rank().over(w).cast("long").alias("pr_dense"),
    )


_RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) / 100.0 AS running_total
FROM orders
"""


@register("window_running_total", _RUNNING_ORACLE)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) total per customer — analytic frame."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(fixed_point(F.col("o_totalprice"), 2)).over(w).cast("double") / 100.0).alias("running_total"),
    )


_LAG_ORACLE = """
SELECT
  event_id,
  user_id,
  CAST(value AS DOUBLE) AS value,
  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
  CAST(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS delta
FROM events
"""


@register("window_lag_delta", _LAG_ORACLE)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() access to the previous row per user (event deltas)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return events.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
    )


_MOVAVG_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS mov_sum,
  COUNT(*) OVER w AS mov_n,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w AS DOUBLE) / 100.0 / (COUNT(*) OVER w) AS mov_avg
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
)
"""


@register("window_moving_avg", _MOVAVG_ORACLE)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving sum/avg — bounded ROWS frame."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    mov_sum = F.sum(fixed_point(F.col("o_totalprice"), 2)).over(w).cast("double") / 100.0
    mov_n = F.count(F.lit(1)).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        mov_sum.alias("mov_sum"),
        mov_n.alias("mov_n"),
        (mov_sum / mov_n).alias("mov_avg"),
    )


_DISTRIBUTION_ORACLE = """
SELECT
  o_orderkey,
  o_orderpriority,
  NTILE(4) OVER w AS quartile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("window_ntile_distribution", _DISTRIBUTION_ORACLE)
def window_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile / percent_rank / cume_dist.

    The ordering key carries a unique tiebreaker (o_orderkey), so
    every row has a deterministic position: ntile buckets, the
    ``(rank-1)/(n-1)`` percent-rank division, and the ``pos/n``
    cume-dist division are all bit-identical across engines and across
    repartitionings.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_RANGE_FRAME_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w AS DOUBLE) / 100.0 AS trailing_90d_spend,
  COUNT(*) OVER w AS trailing_90d_orders
FROM (SELECT o_custkey, o_orderkey, o_totalprice, epoch(o_orderdate) AS ord_sec FROM orders)
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY ord_sec
  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
)
"""


@register("window_range_frame", _RANGE_FRAME_ORACLE)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing-90-day spend per customer.

    Unlike a ROWS frame, the bound is a VALUE distance on the ordering
    key (epoch seconds), so co-equal and near-in-time orders all fall
    in the frame regardless of row position — the time-decayed-metric
    shape.  Deterministic: the frame is defined by values, not by
    tie-ordering, and the sums are exact fixed-point.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    spend = F.sum(fixed_point(F.col("o_totalprice"), 2)).over(w).cast("double") / 100.0
    return orders.select(
        "o_custkey",
        "o_orderkey",
        spend.alias("trailing_90d_spend"),
        F.count(F.lit(1)).over(w).alias("trailing_90d_orders"),
    )


_PCTRANK_ORACLE = """
SELECT
  o_orderkey,
  o_orderpriority,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("window_percent_rank", _PCTRANK_ORACLE)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing within a partition: percent_rank + cume_dist.

    Both are exact rational functions of (rank, n) — (rank−1)/(n−1)
    and rank_with_ties/n — one IEEE division on integers, so
    cross-engine bit-identical.  The ordering carries o_orderkey as a
    tiebreaker to make rank() itself total.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
