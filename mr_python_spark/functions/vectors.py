"""Vector math over ``array<float>`` columns — JVM higher-order functions.

Dot products / norms / cosine are expressed with ``zip_with`` +
``aggregate`` (sequential left-to-right fold → deterministic double
arithmetic, bit-identical to any other engine folding in index order).
The blocked-numpy path for all-pairs work lives in
:mod:`mr_python_spark.similarity`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.registry import register
from mr_python_spark.session import load_table


def to_double(arr: Column) -> Column:
    """Cast array<float> → array<double> (do all math in f64)."""
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm (sequential fold, IEEE-exact sqrt)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


_NORM_ORACLE = """
SELECT
  vec_id,
  label,
  CAST(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS DOUBLE) AS l2,
  CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS comp_sum
FROM embeddings
"""


@register("vector_norms", _NORM_ORACLE)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and component sum (fold-based, no UDF)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        "label",
        l2_norm(v).alias("l2"),
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x).alias("comp_sum"),
    )


_CENTROID_ORACLE = """
SELECT
  label,
  COUNT(*) AS n_vectors,
  CAST(CAST(SUM(CAST(round(CAST(embedding[1] AS DOUBLE) * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
    / COUNT(*) / 1e12 AS centroid_c1,
  CAST(CAST(SUM(CAST(round(CAST(embedding[2] AS DOUBLE) * 1e12) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
    / COUNT(*) / 1e12 AS centroid_c2
FROM embeddings
GROUP BY label
"""


@register("label_centroids", _CENTROID_ORACLE)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (grouped vector aggregation).

    Full-vector centroids at scale: ``Summarizer.mean`` or an Arrow
    pandas UDF; the leading components here keep the oracle exact.
    Components are quantized to integer 1e-12 units and summed
    exactly in DECIMAL(38,0) — order-independent under any
    partitioning, overflow-free to 10³⁸ units (~10²⁶ rows/label; a
    BIGINT sum would silently wrap past ~1.6·10⁷ rows/label in
    Spark's non-ANSI mode while DuckDB promotes to int128 — a latent
    engine/oracle divergence).  The one rounding step, decimal →
    double, goes through a DECIMAL STRING: both engines print the
    exact integer digits and both parse doubles correctly rounded, so
    the conversion is bit-identical at any magnitude — unlike direct
    decimal→double casts (Spark's BigDecimal.doubleValue is one
    correctly-rounded step; DuckDB's int128 path rounds twice, and
    the two disagreed in the last ulp once the 10× fixture pushed the
    scaled sum past 2⁵³; CHECK_SF1 caught it).  The double multiply,
    half-away-from-zero round, exact sum, string round-trip, and the
    final two divisions are the same IEEE sequence in both engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    u1 = F.round(F.element_at("embedding", 1).cast("double") * F.lit(1e12)).cast(
        "decimal(38,0)"
    )
    u2 = F.round(F.element_at("embedding", 2).cast("double") * F.lit(1e12)).cast(
        "decimal(38,0)"
    )
    n = F.count(F.lit(1))
    return emb.groupBy("label").agg(
        n.alias("n_vectors"),
        (F.sum(u1).cast("string").cast("double") / n / F.lit(1e12)).alias(
            "centroid_c1"
        ),
        (F.sum(u2).cast("string").cast("double") / n / F.lit(1e12)).alias(
            "centroid_c2"
        ),
    )


# --- int8 quantization -------------------------------------------------

_QUANT_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM v
)
SELECT vec_id,
       scale,
       array_to_string(
         list_transform(e, x -> CAST(CASE WHEN scale = 0 THEN 0
                                ELSE CAST(floor(x / scale + 0.5) AS INTEGER) END
                                AS VARCHAR)),
         ',') AS codes_csv
FROM s
"""


@register("embedding_int8_quantize", _QUANT_ORACLE)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the storage/serving transform for a trained-embedding corpus
    (4× smaller than f32, 8× smaller than f64; ADC-style scoring
    reads codes + one scale).

    ``scale = max|x| / 127`` and ``code = floor(x/scale + 0.5)`` —
    every step is a deterministic IEEE double op in identical order on
    both engines (abs → max is exact, two single divisions, half-up
    rounding via floor), so codes AND scales are bit-reproducible: a
    100 TB re-run re-derives the identical quantized corpus.  Pure
    JVM higher-order projection — no UDF, no shuffle, no join; at
    scale this is a map-only pass that parallelizes with the scan.

    Codes are emitted comma-joined (``codes_csv``) so the output is
    all-scalar and any order-insensitive hash harness can grade it; a
    storage-facing variant would keep the ``array<tinyint>``.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = to_double(F.col("embedding"))
    with_scale = emb.select(
        "vec_id",
        e.alias("e"),
        (F.array_max(F.transform(e, F.abs)) / F.lit(127.0)).alias("scale"),
    )
    codes = F.transform(
        F.col("e"),
        lambda x: F.when(F.col("scale") == 0, F.lit(0)).otherwise(
            F.floor(x / F.col("scale") + F.lit(0.5)).cast("int")
        ),
    )
    return with_scale.select(
        "vec_id",
        "scale",
        F.array_join(F.transform(codes, lambda c: c.cast("string")), ",").alias(
            "codes_csv"
        ),
    )
