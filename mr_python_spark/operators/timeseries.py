"""Time-series and change-data-capture shapes: gap-fill, SCD2, upserts.

The reference engine has no temporal operators (its closest construct
is the in-key secondary sort, tinymr.py:316-343) — these are capability
extensions in the direction every warehouse workload eventually needs:
densifying an irregular event series onto a calendar, building
slowly-changing-dimension history from a changelog, and applying a
changelog onto a keyed snapshot (the MERGE/upsert shape Spark expresses
as a join when no transactional table format is present).

Scale posture: every query here shuffles once on its natural key
(``user_id`` / ``c_custkey``) and then runs bounded per-key windows —
state per key is the key's own row span, never the corpus.  Calendar
densification generates rows with ``sequence`` + ``explode`` JVM-side
(no Python), so the expansion happens after the shuffle, inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mr_python_spark.registry import register
from mr_python_spark.session import load_table, table_max


_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1),
cal AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
       COALESCE(d.n_events, 0) AS n_events,
       last_value(CAST(d.v AS DOUBLE) IGNORE NULLS) OVER (
         PARTITION BY c.user_id ORDER BY c.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
"""


@register("timeseries_gapfill", _GAPFILL_ORACLE)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify per-user daily series onto a calendar + forward-fill.

    Irregular events → one row per (user, day) over each user's own
    [first_day, last_day] span: missing days appear with ``n_events=0``
    and the day's summed value forward-filled from the last observed
    day (``last(..., ignorenulls=True)`` over a running frame).

    Scale: the calendar is generated per user from an aggregated
    2-column span table (``sequence`` + ``explode``, JVM codegen), so
    the expansion is output-sized, and the fill window partitions by
    user — state is one user's day span.  The daily sum is exact
    fixed-point (decimal) before a single cast to double, so the
    forward-filled value is bit-deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("v"),
        )
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last(F.col("v").cast("double"), ignorenulls=True)
            .over(w)
            .alias("v_filled"),
        )
    )


_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM changes
"""


@register("scd2_event_intervals", _SCD2_ORACLE)
def scd2_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build SCD2 validity intervals from an event changelog.

    Per user, consecutive events with the same type collapse into one
    row whose interval is ``[valid_from, valid_to)``; the current state
    has ``valid_to IS NULL``.  Two stacked windows on the SAME
    partitioning+ordering (``user_id``, then ``ts, event_id``): change
    detection via ``lag``, interval close via ``lead`` — Catalyst
    reuses one shuffle+sort for both since the window specs match.
    Event id breaks timestamp ties so the history is deterministic.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


_CDC_ORACLE = """
WITH latest AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT c.c_custkey,
       CASE WHEN l.user_id IS NULL THEN 'unchanged' ELSE 'updated' END AS status,
       COALESCE(l.value, CAST(c.c_acctbal AS DOUBLE)) AS balance
FROM customer c
LEFT JOIN latest l ON c.c_custkey = l.user_id
WHERE l.user_id IS NULL OR l.event_type <> 'error'
"""


@register("cdc_latest_snapshot", _CDC_ORACLE)
def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a changelog onto a keyed snapshot (MERGE without MERGE).

    The upsert shape: events play a CDC stream keyed by ``user_id``
    over the customer snapshot — the newest record per key wins
    (``row_number`` window, timestamp + id tiebreak), ``error`` events
    act as deletes, anything else updates the balance.  Expressed as
    latest-per-key reduction → left join → filter/coalesce, which is
    exactly what table formats compile MERGE into; both sides shuffle
    once on the key and AQE picks the join strategy from runtime sizes
    (at this SF the reduced changelog broadcasts; at 100 TB it
    shuffle-joins co-partitioned with the snapshot).
    """
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        events.select("user_id", "event_type", "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "ts", "event_id")
    )
    return (
        customer.join(latest, customer.c_custkey == latest.user_id, "left")
        .filter(F.col("user_id").isNull() | (F.col("event_type") != "error"))
        .select(
            "c_custkey",
            F.when(F.col("user_id").isNull(), "unchanged")
            .otherwise("updated")
            .alias("status"),
            F.coalesce("value", F.col("c_acctbal").cast("double")).alias("balance"),
        )
    )


_MERGE_ORACLE = """
WITH changes AS (
  SELECT
    o_orderkey,
    o_custkey,
    o_orderstatus,
    CAST(round(o_totalprice * 110, 0) AS BIGINT) / 100.0 AS o_totalprice,
    'U' AS op
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT
    o_orderkey + (SELECT MAX(o_orderkey) FROM orders) AS o_orderkey,
    o_custkey,
    'N' AS o_orderstatus,
    CAST(o_totalprice AS DOUBLE) AS o_totalprice,
    'I' AS op
  FROM orders WHERE o_orderkey % 97 = 0
  UNION ALL
  SELECT o_orderkey, NULL, NULL, NULL, 'D' AS op
  FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 10 <> 0
)
SELECT
  COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
  COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
  COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
  COALESCE(c.o_totalprice, CAST(b.o_totalprice AS DOUBLE)) AS o_totalprice
FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders) b
FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE COALESCE(c.op, '') <> 'D'
"""


@register("merge_upsert_orders", _MERGE_ORACLE)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet: upsert + delete in one pass.

    The lakehouse write pattern (Delta/Iceberg ``MERGE``) expressed
    as its relational core, since this engine ships no table format:
    base FULL OUTER JOIN changes on the key, matched-update /
    not-matched-insert via ``coalesce``, matched-delete via an op
    filter.  The change set is derived deterministically from the
    base (updates +10% price on keys ≡0 mod 10, inserts with offset
    keys, deletes on keys ≡0 mod 13) so the oracle reproduces it
    exactly.  One shuffle on the merge key; at 100 TB the same plan
    rides a bucketed base table, and a real deployment would also
    partition-prune the rewrite to touched partitions.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    max_key = table_max(spark, sf_dir, "orders", "o_orderkey")
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn(
            "o_totalprice",
            (F.round(F.col("o_totalprice") * 110, 0).cast("long") / 100.0),
        )
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(max_key))
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .withColumn("op", F.lit("I"))
    )
    deletes = (
        orders.filter((F.col("o_orderkey") % 13 == 0) & (F.col("o_orderkey") % 10 != 0))
        .select(
            "o_orderkey",
            F.lit(None).cast("long").alias("o_custkey"),
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit("D").alias("op"),
        )
    )
    changes = updates.unionByName(inserts).unionByName(deletes)
    b = orders.alias("b")
    c = changes.alias("c")
    return (
        b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
        .filter(F.coalesce(F.col("c.op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
            F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.coalesce(
                F.col("c.o_totalprice"), F.col("b.o_totalprice").cast("double")
            ).alias("o_totalprice"),
        )
    )


_FUNNEL_ORACLE = """
WITH first_view AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view'
  GROUP BY user_id
), first_click AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN first_view fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND e.ts > fv.v_ts
    AND e.ts <= fv.v_ts + INTERVAL 6 HOUR
  GROUP BY e.user_id
), first_purchase AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN first_click fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.c_ts
    AND e.ts <= fc.c_ts + INTERVAL 6 HOUR
  GROUP BY e.user_id
)
SELECT
  CASE WHEN p_ts IS NOT NULL THEN 'purchase'
       WHEN c_ts IS NOT NULL THEN 'click'
       ELSE 'view' END AS stage,
  COUNT(*) AS n_users
FROM first_view fv
LEFT JOIN first_click fc USING (user_id)
LEFT JOIN first_purchase fp USING (user_id)
GROUP BY 1
"""


@register("funnel_stages_events", _FUNNEL_ORACLE)
def funnel_stages_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: view → click-after-view → purchase-after-click.

    The product-analytics staple: each stage's timestamp must follow
    the PREVIOUS stage's first occurrence (a click before any view
    does not count), so naive per-type MINs are wrong — the funnel is
    three chained conditional aggregates, each joining the prior
    stage's first-time per user.  Output: users by deepest stage
    reached.

    Scale notes: three aggregates with map-side combine, each join on
    user_id; stage frames shrink monotonically (stage k+1 only joins
    stage-k survivors), so later stages are cheaper, and everything
    stays hash-partitioned on the same key — AQE reuses the layout.
    """
    events = load_table(spark, sf_dir, "events")
    first_view = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    first_click = (
        events.filter(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .filter(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 6 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    first_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 6 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    stage = (
        F.when(F.col("p_ts").isNotNull(), "purchase")
        .when(F.col("c_ts").isNotNull(), "click")
        .otherwise("view")
    )
    return (
        first_view.join(first_click, "user_id", "left")
        .join(first_purchase, "user_id", "left")
        .select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, fs.cohort_week,
         date_diff('week', fs.cohort_week, date_trunc('week', e.ts)) AS week_offset
  FROM events e JOIN firsts fs ON e.user_id = fs.user_id
)
SELECT cohort_week, CAST(week_offset AS BIGINT) AS week_offset,
       COUNT(*) AS n_active
FROM activity
GROUP BY cohort_week, week_offset
"""


@register("cohort_retention_events", _COHORT_ORACLE)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users by first-seen week × weeks since.

    The other product-analytics staple beside the funnel: users cohort
    by the week of their first event; each (cohort, week-offset) cell
    counts users active that many weeks later.  ``date_trunc('week')``
    is Monday-based in both engines and the offset is a whole-week
    difference of truncated timestamps, so the matrix is deterministic.

    Scale notes: one aggregate for first-seen (map-side combined), one
    user_id equi-join, one distinct on (user, cohort, offset) — all
    hash-partitioned on user_id until the final small rollup.
    """
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


_TRANSITION_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM ordered
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences.

    The Markov-chain view of behavior: for each user's time-ordered
    stream, count (previous event type → next event type) pairs.  The
    per-user order is TOTAL (ts, then event_id as the unique
    tiebreaker), so simultaneous events order identically on both
    engines.  One shuffle on user_id for the lag window, then a
    map-side-combined rollup over the 25-cell matrix.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        ordered.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


# --- marketing attribution ----------------------------------------------

#: attribution lookback: a purchase binds to its most recent touch at
#: most this many hours earlier (the funnel family's window)
ATTR_WINDOW_HOURS = 6

_ATTR_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100, 0) AS BIGINT) AS v_fp
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('view', 'click', 'signup')
),
ranked AS (
  SELECT p.event_id AS pid, t.event_type AS channel,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY t.ts DESC, t.event_id DESC) AS rn
  FROM p JOIN t ON t.user_id = p.user_id
   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
   AND t.ts >= p.ts - INTERVAL {ATTR_WINDOW_HOURS} HOUR
),
attr AS (
  SELECT p.event_id, p.v_fp, COALESCE(r.channel, 'direct') AS channel
  FROM p LEFT JOIN ranked r ON r.pid = p.event_id AND r.rn = 1
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(v_fp) AS BIGINT) AS value_fp,
       CAST(SUM(v_fp) AS DOUBLE) / 100.0 AS attributed_value
FROM attr GROUP BY channel
"""


@register("attribution_last_touch", _ATTR_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent view/click/signup within the preceding
    ``ATTR_WINDOW_HOURS``; purchases with no in-window touch credit
    the 'direct' channel.  Completes the behavioral-analytics family
    (funnel → cohort → transition matrix → attribution).

    The engine formulation is join-free: ONE window per user over
    (ts, event_id) total order carries the most recent touch struct
    forward (``last(..., ignorenulls)`` over rows-preceding — the
    suffix property makes "most recent touch" ≡ "most recent touch
    within the window" once the age check is applied).  The oracle
    states the same semantics relationally (touch join + ROW_NUMBER),
    so the two engines cross-check each other's FORMULATION, not just
    arithmetic.  Purchase values aggregate via the audited
    ``fixed_point`` device (non-negative, 2-decimal inputs) so sums
    are exact longs; ``attributed_value`` is the one IEEE division.

    Scale: one shuffle on user_id, bounded per-key window state (the
    carried struct is one row), then a |channels|-row aggregate —
    never a corpus-sized join.  At 100 TB the events table is already
    bucketed by user for the sessionization family; this window rides
    the same layout exchange-free.
    """
    from mr_python_spark.operators.aggregates import fixed_point

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "signup", "purchase")
    ).select("event_id", "user_id", "ts", "event_type", "value")

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type") != "purchase",
            F.struct("ts", "event_type"),
        ),
        ignorenulls=True,
    ).over(w)
    purchases = (
        events.select("*", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("touch").isNotNull()
                & (
                    F.col("touch.ts")
                    >= F.col("ts") - F.expr(f"INTERVAL {ATTR_WINDOW_HOURS} HOURS")
                ),
                F.col("touch.event_type"),
            )
            .otherwise("direct")
            .alias("channel"),
            fixed_point(F.col("value"), 2).alias("v_fp"),
        )
    )
    return purchases.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("v_fp").cast("long").alias("value_fp"),
        (F.sum("v_fp").cast("double") / 100.0).alias("attributed_value"),
    )
