"""String / date / math / JSON scalar functions — all JVM builtins.

Every expression here stays inside whole-stage codegen; nothing drops
to Python.  Cross-engine determinism notes: ``sqrt`` is IEEE
correctly-rounded (safe); ``ln``/``exp``/``pow`` are libm-dependent
(excluded from oracle-checked outputs); double→int casts differ
(Spark truncates, DuckDB rounds) so only explicit floor/ceil/round
appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.operators.aggregates import dec_sum
from mr_python_spark.registry import register
from mr_python_spark.session import load_table


_STRING_ORACLE = """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  CAST(length(p_name) AS INTEGER) AS name_len,
  string_split(p_name, ' ')[1] AS first_word,
  CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num,
  lower(p_type) AS type_lower,
  concat(p_brand, ':', p_type) AS brand_type,
  replace(p_name, ' ', '_') AS name_snake,
  substr(p_name, 1, 4) AS name_prefix,
  trim(p_name) AS name_trim
FROM part
"""


@register("string_funcs_part", _STRING_ORACLE)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/length/split/regexp_extract/concat/replace/substr/trim."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.lower("p_type").alias("type_lower"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.trim("p_name").alias("name_trim"),
    )


_DATE_ORACLE = """
SELECT
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
  CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
FROM orders
GROUP BY 1, 2, 3
"""


@register("date_funcs_orders", _DATE_ORACLE)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/quarter extraction + grouped aggregates — the
    (year, month) composite-key pattern from the reference's sorting
    tests, as native date functions."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.quarter("o_orderdate").alias("qtr"),
            "o_totalprice",
        )
        .groupBy("yr", "mo", "qtr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("sum_price"),
        )
    )


_DATE_ARITH_ORACLE = """
SELECT
  o_orderkey,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
  CAST(date_diff('day', TIMESTAMP '1997-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_epoch_start
FROM orders
WHERE o_orderkey < 500
"""


@register("date_arith_orders", _DATE_ARITH_ORACLE)
def date_arith_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / interval arithmetic / datediff."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1997-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_epoch_start"),
    )


_JSON_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


@register("json_funcs_events", _JSON_ORACLE)
def json_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (string column → typed field)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_VARIANT_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
"""


@register("variant_props_events", _VARIANT_ORACLE)
def variant_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ``VariantType`` (Spark 4): parse once, extract typed.

    ``parse_json`` builds the binary variant encoding — the Spark-4
    answer to schema-on-read JSON columns: parsed ONCE at the scan
    instead of per-``get_json_object`` call, with typed path extraction
    (``variant_get``) and NULL semantics for absent paths
    (``try_variant_get`` here, so a missing key counts instead of
    erroring).  Same aggregate gate as ``json_funcs_events``, which is
    kept on the string-path API for comparison.
    """
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    rows = events.select(
        "event_type",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.missing", "long").alias("missing"),
    )
    return rows.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).alias("n_missing"),
    )


_MAP_ORACLE = """
SELECT
  event_id,
  array_to_string(list_sort(json_keys(props)), ',') AS prop_keys_csv,
  CAST(len(json_keys(props)) AS INTEGER) AS n_entries,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
FROM events
"""


@register("map_funcs_events", _MAP_ORACLE)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type functions: parse JSON into ``map<string,bigint>`` and
    operate on it (keys, cardinality, lookup) — the map-column toolkit
    the §2c checklist calls for, JVM-side end to end.

    The key list is emitted comma-joined (``prop_keys_csv``) so the
    output stays all-scalar for order-insensitive hash harnesses."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return events.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys_csv"),
        F.size(m).alias("n_entries"),
        F.element_at(m, "k").alias("k_val"),
    )


_MATH_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_extendedprice / l_quantity AS DOUBLE) AS unit_price,
  CAST(abs(l_discount - l_tax) AS DOUBLE) AS abs_diff,
  CAST(sqrt(l_quantity) AS DOUBLE) AS qty_sqrt,
  CAST(floor(l_extendedprice / 1000) AS DOUBLE) AS price_kfloor,
  CAST(ceil(l_extendedprice / 1000) AS DOUBLE) AS price_kceil,
  CAST(CASE WHEN l_discount > l_tax THEN 'disc' ELSE 'tax' END AS VARCHAR) AS bigger
FROM lineitem
WHERE l_orderkey < 300
"""


@register("math_funcs_lineitem", _MATH_ORACLE)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic, abs/sqrt/floor/ceil, CASE WHEN — all codegen'd."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("abs_diff"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.floor(F.col("l_extendedprice") / 1000).cast("double").alias("price_kfloor"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("double").alias("price_kceil"),
        F.when(F.col("l_discount") > F.col("l_tax"), "disc").otherwise("tax").alias("bigger"),
    )


_ARRAY_ORACLE = """
SELECT
  vec_id,
  label,
  CAST(len(embedding) AS INTEGER) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_component,
  CAST(embedding[64] AS DOUBLE) AS last_component
FROM embeddings
"""


@register("array_funcs_embeddings", _ARRAY_ORACLE)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array access/length over the embeddings table (1-indexed both)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.element_at("embedding", 64).cast("double").alias("last_component"),
    )


# --- ANSI-safe arithmetic (Spark 4 try_* family) ------------------------

_TRY_ARITH_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS div_by_zero_nulls,
       CAST(SUM(CASE WHEN l_orderkey > 92 THEN 1 ELSE 0 END) AS BIGINT)
         AS overflow_nulls
FROM lineitem GROUP BY l_returnflag
"""


@register("try_arith_lineitem", _TRY_ARITH_ORACLE)
def try_arith_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-handling surface: ``try_divide``/``try_multiply`` under
    ANSI mode.

    The session runs ANSI SQL (Spark 4 default), where ÷0 and bigint
    overflow are runtime ERRORS that kill the job; the ``try_``
    family converts them to NULL row-locally — the production recipe
    for dirty numeric data at scale (one poison row must not fail a
    100 TB pass).  The engine counts the NULLs the try-ops actually
    produced; the oracle independently states WHICH rows must have
    nulled (quantity = 25 ⇒ zero divisor; orderkey > 92 ⇒
    ``92·10¹⁷ < 2⁶³-1 < 93·10¹⁷``) — the two formulations cross-check
    that try-arithmetic nulls exactly the contracted rows, no more,
    no fewer.

    Scale: row-local projections feeding one map-side-combined
    aggregate; whole-stage codegen, no Python, no shuffle beyond the
    group-by.
    """
    li = load_table(spark, sf_dir, "lineitem")
    div = F.expr(
        "try_divide(CAST(l_extendedprice * 100 AS BIGINT), "
        "CAST(l_quantity AS BIGINT) - 25)"
    )
    ovf = F.expr("try_multiply(l_orderkey, 100000000000000000L)")
    return (
        li.select("l_returnflag", div.alias("d"), ovf.alias("m"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("d").isNull().cast("long")).alias("div_by_zero_nulls"),
            F.sum(F.col("m").isNull().cast("long")).alias("overflow_nulls"),
        )
    )
