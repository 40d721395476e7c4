"""Statistical language-model scoring: the CCNet-style perplexity filter.

Train a smoothed bigram LM on a bounded sample of the corpus, then
score every document's fit under the model — documents the LM finds
surprising (gibberish, boilerplate soup, wrong-language text) score
high and get filtered.  This mirrors the perplexity-filter stage of
the published CCNet / RefinedWeb cleaning pipelines, re-expressed with
the engine's cross-engine determinism recipe: NO float logarithms —
per-bigram surprisal is the BIT LENGTH of the exact integer
inverse-probability ratio (``floor(log2(ratio)) + 1`` via the binary
string, verified unpadded and identical in Spark and DuckDB), so the
per-document score is an exact integer sum both engines compute
bit-identically, with one final double division for the mean.

Scale posture (the k-means / PQ / BPE pattern): the model trains on an
``ORDER BY doc_id LIMIT``-capped stride sample — constant size at any
corpus scale, a TakeOrdered, never a full sort — and ships to
executors as two broadcast model tables bounded by the sample's
vocabulary.  Scoring is ONE corpus scan: bigrams are built per-row
inside the token array (``transform`` with index — no window, so the
corpus text never shuffles), map-side joined against the broadcast
model, and reduced by a partial-agged ``groupBy(doc_id)``.  Nothing
corpus-sized is broadcast, collected, or shuffled except the per-doc
aggregate rows.

Capability extension beyond the reference engine (whose text surface
is word count — /root/reference/docs.rst:137-176).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mr_python_spark.functions.text import tokens_col
from mr_python_spark.registry import register
from mr_python_spark.session import load_table

#: Deterministic bounded training sample (matches the BPE trainer's
#: posture): every LM_SAMPLE_STRIDE-th document by id, first
#: LM_SAMPLE_CAP of those by id.  Constant model size at any corpus sf.
LM_SAMPLE_STRIDE = 3
LM_SAMPLE_CAP = 1024


def _bigram_pairs():
    """(w1, bg) structs from the per-row token array — no shuffle.

    ``transform`` exposes the 0-based index; the right neighbor is
    ``element_at(toks, i + 2)`` (1-based).  Emitting the pair struct
    per row keeps bigram construction inside whole-stage codegen and
    off the shuffle path entirely.
    """
    return F.expr(
        "filter(transform(toks, (x, i) -> IF(i < size(toks) - 1,"
        " struct(x AS w1, concat(x, ' ', element_at(toks, i + 2)) AS bg),"
        " NULL)), p -> p IS NOT NULL)"
    )


_LM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
sample_docs AS (
  SELECT doc_id, t FROM toks
  WHERE doc_id % {LM_SAMPLE_STRIDE} = 0
  ORDER BY doc_id LIMIT {LM_SAMPLE_CAP}
),
sample_uni AS (
  SELECT tok, COUNT(*) AS c1
  FROM (SELECT unnest(t) AS tok FROM sample_docs)
  GROUP BY tok
),
vocab AS (SELECT COUNT(*) AS v FROM sample_uni),
sample_bi AS (
  SELECT bg, COUNT(*) AS c12 FROM (
    SELECT t[i] || ' ' || t[i+1] AS bg
    FROM (SELECT doc_id, t, unnest(t) AS tok, generate_subscripts(t, 1) AS i
          FROM sample_docs)
    WHERE i < len(t)
  ) GROUP BY bg
),
corpus_bi AS (
  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg
  FROM (SELECT doc_id, t, unnest(t) AS tok, generate_subscripts(t, 1) AS i
        FROM toks)
  WHERE i < len(t)
),
scored AS (
  SELECT c.doc_id,
         length(bin(
           (COALESCE(u.c1, 0) + (SELECT v FROM vocab)) // (COALESCE(b.c12, 0) + 1)
         )) AS bits
  FROM corpus_bi c
  LEFT JOIN sample_uni u ON c.w1 = u.tok
  LEFT JOIN sample_bi b ON c.bg = b.bg
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
       CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS bits_per_bigram
FROM scored
GROUP BY doc_id
"""


@register("bigram_lm_perplexity", _LM_ORACLE)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bit-surprisal under a sample-trained bigram LM.

    Add-V smoothed conditional: the inverse probability of bigram
    ``w1 w2`` is ``(c(w1) + V) / (c(w1 w2) + 1)`` in exact integers
    (``c12 <= c1`` within the sample and ``V >= 1``, so the integer
    ratio is always >= 1 and its bit length well-defined; unseen
    ``w1`` degrades to the uniform ``V / 1``).  Per-doc score =
    exact integer sum of bit lengths; ``bits_per_bigram`` is the one
    IEEE division, so ``2**bits_per_bigram`` tracks the geometric-mean
    perplexity within the 1-bit-per-gram quantization that buys exact
    cross-engine determinism.

    The two model frames are sample-bounded by construction — the
    broadcast hints are size-safe at any corpus scale (contrast the
    size-GATED dedup verify-join broadcast, whose frame scales with
    the corpus).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("toks")
    )

    sample = (
        docs.filter(F.col("doc_id") % LM_SAMPLE_STRIDE == 0)
        .orderBy("doc_id")
        .limit(LM_SAMPLE_CAP)
    )
    uni = (
        sample.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    # One scalar count of a sample-bounded frame (the adaptive-planning
    # pattern); inlined as a literal so both engines smooth with the
    # same exact V.
    vocab = uni.count()
    bi = (
        sample.select(F.explode(_bigram_pairs()).alias("p"))
        .groupBy(F.col("p.bg").alias("bg"))
        .agg(F.count("*").alias("c12"))
    )

    corpus = docs.select("doc_id", F.explode(_bigram_pairs()).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg")
    )
    scored = (
        corpus.join(F.broadcast(uni), corpus["w1"] == uni["tok"], "left")
        .join(F.broadcast(bi), "bg", "left")
        .select(
            "doc_id",
            F.length(
                F.bin(
                    F.expr(
                        f"(coalesce(c1, 0L) + {vocab}L) div (coalesce(c12, 0L) + 1L)"
                    )
                )
            ).alias("bits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("surprisal_bits"),
        (F.sum("bits").cast("double") / F.count("*")).alias("bits_per_bigram"),
    )
