"""Deduplication family for training-data pipelines.

Five strategies over the ``documents`` / ``embeddings`` tables, each a
``queries()`` entry:

* exact            — hash-groupBy on normalized text (md5)
* n-gram Jaccard   — 3-shingle inverted-index join, exact similarity
* MinHash + LSH    — banded signature buckets → candidates → verify
* SimHash          — 64-bit sign-random-projection, banded hamming
* embedding cosine — near-dup pairs above a cosine threshold

Scale notes (100 TB posture):

* Exact dedup shuffles only (hash, doc_id) — never the text.
* The shingle inverted index is the candidate generator everywhere:
  join cost is Σ df(shingle)², bounded by capping document frequency
  (a shingle present in half the corpus identifies nothing).  The cap
  is OFF by default here (small SFs) and exposed as a parameter.
* MinHash signatures are 64 hashes computed in one pass over exploded
  shingles (groupBy doc, 64 min-aggregates — map-side combined);
  banding 16×4 makes bucket-join cost data-dependent, not quadratic.
* All token hashing is ``xxhash64`` (JVM, seeded, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.functions.text import tokens_col
from mr_python_spark.registry import register
from mr_python_spark.session import load_table, spread

#: MinHash parameters: 64 hashes = 16 bands × 4 rows
MINHASH_HASHES = 64
MINHASH_BANDS = 16
#: 2^31-1 (Mersenne): keeps a·h+b well inside signed-long under ANSI mode
MERSENNE_PRIME = (1 << 31) - 1
#: deterministic affine hash family (fixed seeds → reproducible runs)
_HASH_A = [2 * i + 1 for i in range(1, MINHASH_HASHES + 1)]
_HASH_B = [1_000_003 * i + 12345 for i in range(MINHASH_HASHES)]


def shingle_sets(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, sh: array<string>) — distinct word 3-gram shingles.

    O(tokens) per document: the token array is shifted twice with one
    ``slice`` each and the three alignments are zipped — higher-order
    lambdas are interpreted (outside codegen), so the
    ``transform(sequence(...), i -> slice(...))`` formulation, whose
    per-shingle slice makes it O(tokens²), is ~4× slower on real text.
    The scan is ``spread()`` first: shingling is CPU-bound string work
    and a small file otherwise pins it to one core.
    """
    assert n == 3, "shingle width is fixed at 3 (two shifted zips)"
    toks = spread(docs.select("doc_id", tokens_col(text_col).alias("toks")))
    return toks.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                """
                filter(
                  zip_with(toks,
                           zip_with(slice(toks, 2, size(toks)),
                                    slice(toks, 3, size(toks)),
                                    (y, z) -> concat(y, ' ', z)),
                           (x, yz) -> CASE WHEN yz IS NOT NULL
                                      THEN concat(x, ' ', yz) END),
                  s -> s IS NOT NULL)
                """
            )
        ).alias("sh"),
    )


_EXACT_ORACLE = """
SELECT
  md5(lower(trim(text))) AS content_hash,
  CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
  COUNT(*) AS n_copies
FROM documents
GROUP BY md5(lower(trim(text)))
"""


@register("dedup_exact", _EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one winner (min doc_id) per normalized-content hash.

    Shuffles 32-byte hashes + ids only; the text never moves.  At any
    scale this is one hash-aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"), "doc_id"
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_DUPES_ORACLE = """
SELECT
  md5(lower(trim(text))) AS content_hash,
  CAST(doc_id AS BIGINT) AS dup_doc_id
FROM documents
QUALIFY doc_id > MIN(doc_id) OVER (PARTITION BY md5(lower(trim(text))))
"""


@register("dedup_exact_losers", _DUPES_ORACLE)
def dedup_exact_losers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rows a dedup pass would DROP (doc_id > group winner)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = F.md5(F.lower(F.trim(F.col("text"))))
    w = Window.partitionBy("content_hash")
    return (
        docs.select(h.alias("content_hash"), F.col("doc_id").alias("dup_doc_id"))
        .withColumn("winner", F.min("dup_doc_id").over(w))
        .filter(F.col("dup_doc_id") > F.col("winner"))
        .select("content_hash", "dup_doc_id")
    )


_NGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
), pos AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM (
    SELECT doc_id, t, unnest(t) FROM toks
  )
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM pos WHERE i <= len(t) - 2
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT
  doc_a,
  doc_b,
  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 50
"""


@register("dedup_ngram_jaccard", _NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle Jaccard: top-50 most similar document pairs.

    Inverted-index join (pairs must share ≥1 shingle — lossless
    pruning, pairs sharing none have similarity 0), then one
    hash-aggregate per pair.  Jaccard = ratio of small exact ints →
    bit-identical across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    # inverted index: hash shingles to longs (8-byte join key instead of
    # a ~20-byte string; 64-bit collisions are ~(n_shingles)²/2⁶⁵) and
    # materialize once — it feeds the join twice plus the size table.
    sh = (
        shingle_sets(docs)
        .select("doc_id", F.explode("sh").alias("shingle"))
        .select("doc_id", F.xxhash64("shingle").alias("sh"))
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(50)
    )


#: max document frequency for a shingle to act as a candidate key
DF_CAP = 10

_NGRAM_CAPPED_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
), pos AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM (
    SELECT doc_id, t, unnest(t) FROM toks
  )
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM pos WHERE i <= len(t) - 2
), rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a
  JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN rare r ON r.shingle = a.shingle
), sets AS (
  SELECT doc_id, list(shingle) AS ss FROM sh GROUP BY doc_id
)
SELECT
  doc_a,
  doc_b,
  CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
    / (len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss))) AS jaccard
FROM cand
JOIN sets sa ON sa.doc_id = doc_a
JOIN sets sb ON sb.doc_id = doc_b
WHERE CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
    / (len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss))) >= 0.2
"""


@register("dedup_ngram_df_capped", _NGRAM_CAPPED_ORACLE)
def dedup_ngram_df_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard dedup with the 100 TB candidate-generation cap ON.

    Candidate pairs come only from shingles whose document frequency
    is ≤ ``DF_CAP`` — the inverted-index join cost drops from
    Σ df² to Σ min(df, cap)², which is what keeps the join feasible
    when a boilerplate shingle appears in millions of documents.
    Verification still uses FULL shingle sets (exact Jaccard), so the
    cap only affects which pairs are considered, never their scores;
    pairs whose every common shingle is popular are the accepted
    recall loss.  Returns pairs with jaccard ≥ 0.2.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh_sets = shingle_sets(docs).cache()
    exploded = sh_sets.select("doc_id", F.explode("sh").alias("shingle"))
    rare = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("shingle")
    )
    keyed = exploded.join(rare, "shingle")
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh_sets.alias("sa")
    sb = sh_sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    union = F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - inter
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64 minhashes per document in one pass (doc_id, sig array<long>).

    Shingle → xxhash64 → 64 affine permutations (a·h+b mod p) →
    64 parallel MIN aggregates with map-side combine.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        shingle_sets(docs)
        .select("doc_id", F.explode("sh").alias("shingle"))
        .select("doc_id", F.pmod(F.xxhash64("shingle"), F.lit(MERSENNE_PRIME)).alias("h"))
    )
    mins = [
        F.min(
            F.pmod(F.lit(_HASH_A[i]) * F.col("h") + F.lit(_HASH_B[i]), F.lit(MERSENNE_PRIME))
        ).alias(f"mh{i}")
        for i in range(MINHASH_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"mh{i}") for i in range(MINHASH_HASHES)]).alias("sig"),
    )


@register("dedup_minhash_lsh")  # rows-only: multi-stage hashing isn't portable SQL
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, verified with exact Jaccard.

    Band signatures (16 bands × 4 rows) → bucket join on
    (band, band_hash) → distinct candidate pairs → exact Jaccard via
    array_intersect on distinct-shingle arrays.  Returns pairs with
    jaccard ≥ 0.5.  Fully deterministic (seeded hash family) but
    rows-only checked — DuckDB lacks xxhash64.
    """
    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    sig = minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bhash").cache()
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    sh_sets = shingle_sets(docs).cache()
    sa = sh_sets.alias("sa")
    sb = sh_sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
    union = F.size(F.col("sa.sh")) + F.size(F.col("sb.sh")) - inter
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


@register("dedup_simhash")  # rows-only: bit-twiddling hash pipeline
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs (banded hamming ≤ 3).

    Per token bit b: +1 if bit set else -1; sign of the per-bit sum
    forms the fingerprint.  Candidates must share one of four 16-bit
    bands (hamming ≤ 3 ⇒ some band is identical); verified with
    bit_count(xor).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = spread(docs).select("doc_id", F.explode(tokens_col()).alias("tok")).select(
        "doc_id", F.xxhash64("tok").alias("h")
    )
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i)).otherwise(0)
                for i in range(63)  # bit 63 kept zero: stay in signed-long range
            ]
        ).alias("fp"),
    )
    bands = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("fp"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "fp", "bb.band", "bb.bval")
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


_EMB_PAIRS_ORACLE = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
)
SELECT
  a.vec_id AS vec_a,
  b.vec_id AS vec_b
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.e, b.e), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (a.nrm * b.nrm) >= 0.4
"""


@register("dedup_embedding_cosine", _EMB_PAIRS_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.4 (threshold is corpus-tuned).

    Blocked GEMM: the normalized corpus matrix is broadcast, every
    partition multiplies its block against it (Arrow/numpy, f64) and
    emits only qualifying pairs with vec_a < vec_b — shuffle carries
    pairs, never vectors.  Right up to ~10⁵ vectors per broadcast; the
    100 TB path replaces the broadcast with LSH bucketing
    (random-projection bands) or the IVF pruning in
    :mod:`mr_python_spark.similarity`.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    bc = spark.sparkContext.broadcast((ids[order], mat[order]))

    schema = T.StructType(
        [T.StructField("vec_a", T.LongType()), T.StructField("vec_b", T.LongType())]
    )

    def pairs_block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            blk_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            blk = np.array(list(pdf["embedding"]), dtype=np.float64)
            blk /= np.linalg.norm(blk, axis=1, keepdims=True)
            sims = blk @ all_mat.T
            bi, ci = np.nonzero(sims >= 0.4)
            a, b = blk_ids[bi], all_ids[ci]
            keep = a < b  # each unordered pair emitted exactly once
            if keep.any():
                yield pd.DataFrame({"vec_a": a[keep], "vec_b": b[keep]})

    return emb.select("vec_id", "embedding").mapInPandas(pairs_block, schema)


_CLUSTERS_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
), pos AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM (
    SELECT doc_id, t, unnest(t) FROM toks
  )
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM pos WHERE i <= len(t) - 2
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), edges AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
), bidir AS (
  SELECT doc_a AS v1, doc_b AS v2 FROM edges
  UNION ALL
  SELECT doc_b AS v1, doc_a AS v2 FROM edges
), verts AS (
  SELECT DISTINCT v1 AS v FROM bidir
), reach AS (
  WITH RECURSIVE r(src, node) AS (
    SELECT v, v FROM verts
    UNION
    SELECT r.src, b.v2 FROM r JOIN bidir b ON b.v1 = r.node
  )
  SELECT src, MIN(node) AS cluster_id FROM r GROUP BY src
)
SELECT src AS doc_id, cluster_id FROM reach
"""


@register("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over near-dup pairs.

    Pair lists aren't enough for a real dedup pass — transitive
    near-dups (A~B, B~C) must collapse into one cluster with one
    survivor.  Components are computed by iterative min-label
    propagation on the jaccard-≥0.5 edge set: each round every vertex
    takes the min label among itself and its neighbors; converged
    when a round changes nothing (checked with a count per round, so
    iterations are data-bounded, not guessed).  Labels are min
    doc_ids → fully deterministic.  The oracle is the same graph
    closed with a recursive CTE.

    Scale notes: this is the standard big-data components loop
    (GraphX/GraphFrames use the same alternating join-aggregate);
    rounds = graph diameter, which for near-dup clusters is tiny.
    Each round is one join + one aggregate on the (small) edge set —
    the document corpus itself is never re-read.
    """
    # edge set: exact jaccard >= 0.5 (reuse the inverted-index pipeline)
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        shingle_sets(docs)
        .select("doc_id", F.explode("sh").alias("shingle"))
        .select("doc_id", F.xxhash64("shingle").alias("sh"))
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pair_counts = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    edges = (
        pair_counts.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(
            F.col("n_common").cast("double")
            / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common"))
            >= 0.5
        )
        .select("doc_a", "doc_b")
        .cache()
    )
    bidir = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).cache()
    labels = (
        bidir.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .cache()
    )
    while True:
        neigh = (
            bidir.join(labels, bidir.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("neigh_min"))
        )
        new_labels = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("neigh_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("doc_id", "cluster_id")
