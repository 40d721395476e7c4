"""Unigram-LM (SentencePiece-style) tokenizer: bounded-sample training,
distributed encode — the second of the two subword tokenizers modern
pipelines choose between (BPE builds up by merging; unigram starts
from a rich seed vocabulary and PRUNES, then segments each word by
lowest total piece cost).

Training is Viterbi-EM (the hard-EM simplification of Kudo 2018) on
the SAME deterministic bounded sample as the BPE trainer (stride
subset, ``ORDER BY doc_id LIMIT cap`` — constant driver memory at any
corpus size), and encoding is the SAME Arrow-batched ``mapInPandas``
shape with a per-batch word cache.  The model ships to executors by
closure (≤ ``UNIGRAM_VOCAB`` piece→cost entries).

Determinism — the engine's no-float-logs recipe throughout:

* Piece cost is the BIT LENGTH of the exact integer inverse-probability
  ratio ``(T + V) div (count + 1)`` (T = Σ counts, V = |vocab| — the
  same add-V device as the bigram LM), so Viterbi compares exact
  integers, never float log-probs.
* Viterbi ties break to the LONGEST last piece (then the shorter
  candidates are never revisited) — a total order, identical in every
  implementation of the spec.
* Seed selection and pruning order by ``(count DESC, piece ASC)`` —
  total orders again.

The DuckDB gate reimplements the whole train+encode pipeline
independently in tools/udf_oracles.py (same spec, different code);
tests/test_hash_pipelines.py cross-checks a naive third trainer.

Reference scope note: tinymr has no tokenizer surface — this is the
training-data-pipeline extension tier (SURVEY.md §6), completing the
BPE/unigram tokenizer pair (functions/bpe.py is the other half).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mr_python_spark.functions.bpe import (
    BPE_SAMPLE_CAP,
    BPE_SAMPLE_STRIDE,
    _words,
)
from mr_python_spark.registry import register
from mr_python_spark.session import load_table, spread

#: longest piece considered anywhere (seeding, Viterbi window)
UNIGRAM_MAX_PIECE = 8
#: multi-char seed pieces kept (plus every single char seen)
UNIGRAM_SEED_MULTI = 2048
#: final vocabulary target (chars always survive pruning, so the
#: effective floor is the sample's alphabet size)
UNIGRAM_VOCAB = 512
#: Viterbi-EM rounds before pruning
UNIGRAM_EM_ITERS = 3
#: cost charged for a single character absent from the vocabulary
#: (corpus chars the sample never saw) — larger than any real piece
#: cost, which is bounded by bitlen(T + V) < 64
UNIGRAM_UNK_COST = 64


def _piece_cost(count: int, total: int, vocab_size: int) -> int:
    """Exact-integer piece cost: bitlen((T + V) div (c + 1)).

    ``c <= T`` and ``V >= 1`` keep the ratio >= 1, so the bit length
    is >= 1 and well-defined; a zero-count piece degrades toward the
    uniform ``T + V`` cost — the add-V smoothing of the bigram LM.
    """
    return ((total + vocab_size) // (count + 1)).bit_length()


def _viterbi(word: str, costs: dict[str, int]) -> list[str]:
    """Lowest-total-cost segmentation of ``word`` under ``costs``.

    dp ascends; candidate pieces are ``word[i:j]`` with
    ``j - i <= UNIGRAM_MAX_PIECE`` present in the vocab, plus the
    single-char UNK fallback at ``UNIGRAM_UNK_COST``.  Ties break to
    the LONGEST last piece (smallest i) — a total order, since the
    candidates at a given j have distinct lengths.
    """
    n = len(word)
    INF = float("inf")
    dp: list = [INF] * (n + 1)
    back = [0] * (n + 1)
    dp[0] = 0
    for j in range(1, n + 1):
        best_cost, best_i = INF, j - 1
        for i in range(max(0, j - UNIGRAM_MAX_PIECE), j):
            if dp[i] is INF:
                continue
            c = costs.get(word[i:j])
            if c is None:
                if j - i != 1:
                    continue
                c = UNIGRAM_UNK_COST
            cand = dp[i] + c
            # strict < : on equal cost the earlier (smaller) i — the
            # longer last piece — wins because i ascends
            if cand < best_cost:
                best_cost, best_i = cand, i
        dp[j] = best_cost
        back[j] = best_i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def train_unigram(word_freq: dict[str, int]):
    """Deterministic unigram-LM training over a word-frequency table.

    Returns ``(pieces, counts, costs)`` where ``pieces`` is the final
    vocabulary in rank order ``(count DESC, piece ASC)`` and the dicts
    carry the final Viterbi usage counts and bit costs.

    Stages (every order a total order):

    1. SEED: substring occurrence counts (freq-weighted, all start
       positions, length <= UNIGRAM_MAX_PIECE); vocabulary = every
       single char + the top UNIGRAM_SEED_MULTI multi-char pieces by
       (count DESC, piece ASC).
    2. VITERBI-EM x UNIGRAM_EM_ITERS: costs from current counts;
       re-count piece usage over each word's Viterbi segmentation
       (freq-weighted).
    3. PRUNE to UNIGRAM_VOCAB by (count DESC, piece ASC), single
       chars exempt; one final Viterbi recount over the pruned vocab
       gives the shipped counts and costs.
    """
    seed: dict[str, int] = {}
    for w, f in word_freq.items():
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(L, i + UNIGRAM_MAX_PIECE) + 1):
                s = w[i:j]
                seed[s] = seed.get(s, 0) + f
    chars = sorted(s for s in seed if len(s) == 1)
    multi = sorted(
        (s for s in seed if len(s) > 1), key=lambda s: (-seed[s], s)
    )[:UNIGRAM_SEED_MULTI]
    vocab = chars + multi
    counts = {s: seed[s] for s in vocab}

    def recount(costs: dict[str, int]) -> dict[str, int]:
        nxt = dict.fromkeys(vocab, 0)
        for w, f in word_freq.items():
            for piece in _viterbi(w, costs):
                if piece in nxt:
                    nxt[piece] += f
        return nxt

    for _ in range(UNIGRAM_EM_ITERS):
        total = sum(counts.values())
        v = len(vocab)
        costs = {s: _piece_cost(c, total, v) for s, c in counts.items()}
        counts = recount(costs)

    keep_multi = sorted(
        (s for s in vocab if len(s) > 1), key=lambda s: (-counts[s], s)
    )[: max(0, UNIGRAM_VOCAB - len(chars))]
    vocab = chars + keep_multi
    counts = {s: counts[s] for s in vocab}
    total = sum(counts.values())
    v = len(vocab)
    costs = {s: _piece_cost(c, total, v) for s, c in counts.items()}
    counts = recount(costs)
    total = sum(counts.values())
    costs = {s: _piece_cost(c, total, v) for s, c in counts.items()}
    pieces = sorted(vocab, key=lambda s: (-counts[s], s))
    return pieces, counts, costs


_UNIGRAM_MODELS: dict[tuple, tuple] = {}


def trained_unigram(spark: SparkSession, sf_dir: str):
    """(pieces, counts, costs) for a corpus, cached per file identity
    (the BPE/k-means/PQ model-cache pattern): stride-``BPE_SAMPLE_
    STRIDE`` docs, ``ORDER BY doc_id LIMIT BPE_SAMPLE_CAP``,
    word-frequency aggregated DISTRIBUTED — only the bounded freq
    table reaches the driver, never the text."""
    import os

    from pyspark.sql import functions as F

    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    key = (os.path.realpath(p), st.st_size, st.st_mtime_ns)
    model = _UNIGRAM_MODELS.get(key)
    if model is None:
        docs = load_table(spark, sf_dir, "documents")
        sample = (
            docs.filter(F.col("doc_id") % BPE_SAMPLE_STRIDE == 0)
            .orderBy("doc_id")
            .limit(BPE_SAMPLE_CAP)
        )
        freq_rows = (
            sample.select(
                F.explode(
                    F.filter(
                        F.split(F.lower("text"), r"\s+"), lambda t: t != ""
                    )
                ).alias("word")
            )
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("f"))
            .collect()
        )
        model = train_unigram({r.word: r.f for r in freq_rows})
        _UNIGRAM_MODELS[key] = model
    return model


@register("unigram_vocab")  # deterministic piece table; udf-oracle tier
def unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram vocabulary: (rank, piece, count, cost_bits).

    The artifact a pipeline ships alongside the encoded corpus —
    inspectable, joinable, and the exact model the encode pass uses
    (rank order is the pruning total order).  Verified piece-for-piece
    against the independent oracle trainer (tools/udf_oracles.py) and
    the naive pytest reimplementation.
    """
    pieces, counts, costs = trained_unigram(spark, sf_dir)
    rows = [
        (i, s, counts[s], costs[s]) for i, s in enumerate(pieces)
    ]
    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("piece", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("cost_bits", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


_UNIGRAM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_unigram_tokens", T.IntegerType()),
        T.StructField("n_unique_pieces", T.IntegerType()),
    ]
)


@register("unigram_token_stats")  # udf-oracle in tools/udf_oracles.py
def unigram_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword statistics under the trained unigram LM:
    word count, piece count, distinct pieces — the token-budget
    accounting pass, Viterbi flavor (the BPE twin is
    ``bpe_token_stats``; comparing the two is exactly the
    BPE-vs-unigram evaluation a tokenizer bake-off runs).

    Encoding is an Arrow-batched ``mapInPandas`` pass; the piece→cost
    model (≤ UNIGRAM_VOCAB entries) ships by closure and a per-batch
    word→segmentation cache makes the cost per distinct word, not per
    occurrence.  All outputs are exact integers — bit-deterministic,
    gated against an independent DuckDB UDF reimplementation of the
    full train+encode pipeline.
    """
    from typing import Iterator

    import pandas as pd

    _, _, costs = trained_unigram(spark, sf_dir)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def seg(w: str) -> list[str]:
            toks = cache.get(w)
            if toks is None:
                toks = _viterbi(w, costs)
                cache[w] = toks
            return toks

        for pdf in batches:
            if pdf.empty:
                continue
            n_words, n_tok, n_uniq = [], [], []
            for text in pdf["text"]:
                ws = _words(text)
                toks: list[str] = []
                for w in ws:
                    toks.extend(seg(w))
                n_words.append(len(ws))
                n_tok.append(len(toks))
                n_uniq.append(len(set(toks)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_unigram_tokens": n_tok,
                    "n_unique_pieces": n_uniq,
                }
            )

    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.mapInPandas(stats, _UNIGRAM_STATS_SCHEMA)
