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
from mr_python_spark.session import load_table, scan_partitions, spread

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
        T.StructField("n_oov_free_words", T.IntegerType()),
    ]
)


@register("unigram_token_stats")  # udf-oracle in tools/udf_oracles.py
def unigram_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword statistics under the trained unigram LM:
    word count, piece count, distinct pieces, OOV-free words (no UNK
    fallback anywhere in the word's Viterbi path) — the token-budget
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
        # cache: word -> (pieces, oov_free); oov_free means the Viterbi
        # path never took the single-char UNK fallback (every piece is
        # in the trained vocab)
        cache: dict[str, tuple[list[str], bool]] = {}

        def seg(w: str) -> tuple[list[str], bool]:
            hit = cache.get(w)
            if hit is None:
                toks = _viterbi(w, costs)
                hit = (toks, all(t in costs for t in toks))
                cache[w] = hit
            return hit

        for pdf in batches:
            if pdf.empty:
                continue
            n_words, n_tok, n_uniq, n_cov = [], [], [], []
            for text in pdf["text"]:
                ws = _words(text)
                toks: list[str] = []
                cov = 0
                for w in ws:
                    wt, ok = seg(w)
                    toks.extend(wt)
                    cov += ok
                n_words.append(len(ws))
                n_tok.append(len(toks))
                n_uniq.append(len(set(toks)))
                n_cov.append(cov)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "n_unigram_tokens": n_tok,
                    "n_unique_pieces": n_uniq,
                    "n_oov_free_words": n_cov,
                }
            )

    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        parts=scan_partitions(spark, sf_dir, "documents"),
    )
    return docs.mapInPandas(stats, _UNIGRAM_STATS_SCHEMA)


# --- tokenizer bake-off (BPE vs unigram, shared sample posture) --------

BAKEOFF_EXTRA_PIECES = 12  #: matched multi-char vocab budget for BOTH models


def budgeted_bpe_model(spark: SparkSession, sf_dir: str):
    """``(ranks, vocab)`` of the budget-``BAKEOFF_EXTRA_PIECES`` BPE:
    the first K merges of the trained table (greedy BPE training is
    sequential, so the K-prefix IS ``train_bpe(wf, K)`` — no retrain)
    plus the full sample alphabet."""
    from mr_python_spark.functions.bpe import trained_bpe_model

    merges, alphabet = trained_bpe_model(spark, sf_dir)
    b = merges[:BAKEOFF_EXTRA_PIECES]
    return {p: i for i, p in enumerate(b)}, alphabet | {x + y for x, y in b}


def budgeted_unigram_costs(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Piece→cost of the budget-``BAKEOFF_EXTRA_PIECES`` unigram LM:
    every single char (chars are prune-exempt, as in training) plus the
    top-K multi-char pieces in trained rank order ``(count DESC, piece
    ASC)``, costs refreshed from the restricted counts (prune without
    re-estimation — deterministic, total-ordered)."""
    pieces, counts, _ = trained_unigram(spark, sf_dir)
    keep = [p for p in pieces if len(p) == 1]
    keep += [p for p in pieces if len(p) > 1][:BAKEOFF_EXTRA_PIECES]
    total, v = sum(counts[p] for p in keep), len(keep)
    return {p: _piece_cost(counts[p], total, v) for p in keep}


_BAKEOFF_FUSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("bpe_toks", T.IntegerType()),
        T.StructField("bpe_cov", T.IntegerType()),
        T.StructField("uni_toks", T.IntegerType()),
        T.StructField("uni_cov", T.IntegerType()),
    ]
)


def _fused_stats_pass(docs, bpe_enc, uni_enc) -> DataFrame:
    """Arrow-batched per-doc stats for BOTH tokenizers in ONE pass over
    the text (per-batch distinct-word cache per model).

    This was two ``mapInPandas`` passes joined on doc_id; the fusion
    halves the dominant costs — the corpus text crossing the Python
    boundary and the per-doc word split — and removes the stats join
    entirely (guide §4.1: the Python boundary is paid per column pass;
    §2.4: one fewer exchange/broadcast).  The per-doc integers are
    computed by the identical encode calls, so the fused frame is
    row-for-row the old joined frame.
    """
    from typing import Iterator

    import pandas as pd

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache_b: dict[str, tuple[int, bool]] = {}
        cache_u: dict[str, tuple[int, bool]] = {}

        def enc(w: str, cache: dict, encode) -> tuple[int, bool]:
            hit = cache.get(w)
            if hit is None:
                toks, ok = encode(w)
                hit = (len(toks), ok)
                cache[w] = hit
            return hit

        for pdf in batches:
            if pdf.empty:
                continue
            n_words, b_tok, b_cov, u_tok, u_cov = [], [], [], [], []
            for text in pdf["text"]:
                ws = _words(text)
                tb = cb = tu = cu = 0
                for w in ws:
                    nt, ok = enc(w, cache_b, bpe_enc)
                    tb += nt
                    cb += ok
                    nt, ok = enc(w, cache_u, uni_enc)
                    tu += nt
                    cu += ok
                n_words.append(len(ws))
                b_tok.append(tb)
                b_cov.append(cb)
                u_tok.append(tu)
                u_cov.append(cu)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": n_words,
                    "bpe_toks": b_tok,
                    "bpe_cov": b_cov,
                    "uni_toks": u_tok,
                    "uni_cov": u_cov,
                }
            )

    return docs.mapInPandas(stats, _BAKEOFF_FUSED_SCHEMA)


@register("tokenizer_bakeoff_report")  # udf-oracle in tools/udf_oracles.py
def tokenizer_bakeoff_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Side-by-side BPE-vs-unigram evaluation at a MATCHED vocab budget
    — THE comparison a pipeline runs before picking a tokenizer (the
    BPE-vs-unigram ablation of Kudo & Richardson 2018, and the
    controlled setting of Bostrom & Durrett 2020: same multi-char
    budget for both models so the segmentation algorithm, not the
    vocabulary size, is what's measured).

    Both models train from the SAME bounded sample posture (stride +
    ``ORDER BY doc_id LIMIT`` cap) and are restricted to the same
    ``BAKEOFF_EXTRA_PIECES`` multi-char budget — necessary here
    because at full budget both memorize this corpus' tiny word
    inventory and every metric degenerates to 1.0.  Per language:
    fertility (subwords per word), compression (chars per subword),
    and OOV-free coverage (fraction of words whose encoding never
    leaves the model vocab) for BOTH tokenizers.

    ONE fused Arrow-batched ``mapInPandas`` pass computes BOTH models'
    per-doc stats (the text crosses the Python boundary once and each
    doc is word-split once — this was two passes + a doc_id stats
    join until r16-opt), one equi-join attaches the documents
    metadata, then a |langs|-row aggregate: every sum is an exact
    integer; each ratio is a final single IEEE division on identical
    operands — bit-deterministic cross-engine.  At 100 TB the stats
    pass streams (per-batch word cache per model, models ship by
    closure), the doc_id join is an AQE-planned shuffle of narrow int
    frames (text never shuffles), and the aggregate is partial →
    |langs| rows.
    """
    from pyspark.sql import functions as F

    from mr_python_spark.functions.bpe import encode_word
    from mr_python_spark.session import load_table, scan_partitions, spread

    b_ranks, b_vocab = budgeted_bpe_model(spark, sf_dir)
    u_costs = budgeted_unigram_costs(spark, sf_dir)

    def bpe_enc(w: str) -> tuple[list[str], bool]:
        toks = encode_word(w, b_ranks)
        return toks, all(t in b_vocab for t in toks)

    def uni_enc(w: str) -> tuple[list[str], bool]:
        toks = _viterbi(w, u_costs)
        return toks, all(t in u_costs for t in toks)

    docs = load_table(spark, sf_dir, "documents")
    text = spread(
        docs.select("doc_id", "text"),
        parts=scan_partitions(spark, sf_dir, "documents"),
    )
    fused = _fused_stats_pass(text, bpe_enc, uni_enc)
    meta = docs.select("doc_id", "lang", "n_chars")
    g = (
        fused.join(meta, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("bpe_toks").alias("bpe_tokens"),
            F.sum("uni_toks").alias("unigram_tokens"),
            F.sum("bpe_cov").alias("bpe_oov_free_words"),
            F.sum("uni_cov").alias("unigram_oov_free_words"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # Degenerate-language guard: a language whose docs are all
    # whitespace-empty has n_words = 0 (and then tokens = 0) — the
    # ratios are pinned to NULL explicitly, mirrored by NULLIF in the
    # udf-oracle, so both engines agree by construction instead of
    # relying on matching divide-by-zero semantics.
    ratio = lambda num, den: F.when(F.col(den) > 0, d(num) / d(den))  # noqa: E731
    return g.select(
        "lang",
        "n_docs",
        "n_words",
        "n_chars",
        "bpe_tokens",
        "unigram_tokens",
        "bpe_oov_free_words",
        "unigram_oov_free_words",
        ratio("bpe_tokens", "n_words").alias("bpe_fertility"),
        ratio("unigram_tokens", "n_words").alias("unigram_fertility"),
        ratio("n_chars", "bpe_tokens").alias("bpe_chars_per_token"),
        ratio("n_chars", "unigram_tokens").alias("unigram_chars_per_token"),
        ratio("bpe_oov_free_words", "n_words").alias("bpe_oov_free_rate"),
        ratio("unigram_oov_free_words", "n_words").alias("unigram_oov_free_rate"),
    )


_BAKEOFF_ENVELOPE_ORACLE = r"""
WITH d AS (
  SELECT lang, n_chars,
         len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''))
           AS nw
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nw) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       TRUE AS bpe_fertility_ge_one,
       TRUE AS unigram_fertility_ge_one,
       TRUE AS bpe_tokens_le_chars,
       TRUE AS unigram_tokens_le_chars,
       TRUE AS bpe_coverage_valid,
       TRUE AS unigram_coverage_valid
FROM d GROUP BY lang
"""


@register("tokenizer_bakeoff_envelope", _BAKEOFF_ENVELOPE_ORACLE)
def tokenizer_bakeoff_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-oracle envelope for :func:`tokenizer_bakeoff_report` (whose
    two trained encodes DuckDB can only replay via Python UDFs): runs
    the full bake-off — BOTH tokenizer trainings, BOTH Arrow encode
    passes, the joins, the per-language aggregate — and re-shapes the
    output into columns a model-free oracle pins exactly (``n_docs`` /
    ``n_words`` / ``n_chars``: whitespace tokenization is
    engine-agnostic, ``n_chars`` is table metadata) plus six invariant
    flags carrying both tokenizers' outputs: fertility ≥ 1 (every word
    encodes to ≥ 1 piece), Σtokens ≤ Σchars (pieces never outnumber
    characters), and 0 ≤ oov_free ≤ words for each model.  A broken
    trainer, encode, or join flips a flag or shifts an exact column
    and fails the hash gate; the full-strength token/coverage-count
    gate stays on the parent's udf-oracle in the sweep.  Same device
    as ``tokenizer_fertility_envelope``.
    """
    from pyspark.sql import functions as F

    rep = tokenizer_bakeoff_report(spark, sf_dir)
    return rep.select(
        "lang",
        "n_docs",
        "n_words",
        "n_chars",
        (F.col("bpe_tokens") >= F.col("n_words")).alias("bpe_fertility_ge_one"),
        (F.col("unigram_tokens") >= F.col("n_words")).alias(
            "unigram_fertility_ge_one"
        ),
        (F.col("bpe_tokens") <= F.col("n_chars")).alias("bpe_tokens_le_chars"),
        (F.col("unigram_tokens") <= F.col("n_chars")).alias(
            "unigram_tokens_le_chars"
        ),
        (
            (F.col("bpe_oov_free_words") >= 0)
            & (F.col("bpe_oov_free_words") <= F.col("n_words"))
        ).alias("bpe_coverage_valid"),
        (
            (F.col("unigram_oov_free_words") >= 0)
            & (F.col("unigram_oov_free_words") <= F.col("n_words"))
        ).alias("unigram_coverage_valid"),
    )


_UNIGRAM_STATS_ENVELOPE_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> ''))
           AS nw
  FROM documents
)
SELECT doc_id,
       CAST(nw AS INTEGER) AS n_words,
       TRUE AS fertility_ge_one,
       TRUE AS tokens_le_chars,
       TRUE AS unique_le_tokens,
       TRUE AS coverage_valid
FROM d
"""


@register("unigram_stats_envelope", _UNIGRAM_STATS_ENVELOPE_ORACLE)
def unigram_stats_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-oracle envelope for :func:`unigram_token_stats` (whose
    Viterbi encode DuckDB can only replay via Python UDFs): runs the
    parent's full Arrow encode pass and re-shapes each PER-DOCUMENT
    row into a column the model-free oracle pins exactly (``n_words``
    — the same whitespace tokenization on both engines) plus four
    invariant flags carrying the Viterbi outputs: fertility >= 1
    (every word segments to >= 1 piece), pieces <= n_chars (every
    piece is >= 1 char of its word), distinct pieces <= pieces, and
    0 <= OOV-free words <= words.  The BPE twin is
    ``bpe_stats_envelope``; the full piece-count gate stays on the
    parent's udf-oracle in the sweep.
    """
    from pyspark.sql import functions as F

    stats = unigram_token_stats(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return stats.join(docs, "doc_id").select(
        "doc_id",
        "n_words",
        (F.col("n_unigram_tokens") >= F.col("n_words")).alias(
            "fertility_ge_one"
        ),
        (F.col("n_unigram_tokens") <= F.col("n_chars")).alias(
            "tokens_le_chars"
        ),
        (F.col("n_unique_pieces") <= F.col("n_unigram_tokens")).alias(
            "unique_le_tokens"
        ),
        (
            (F.col("n_oov_free_words") >= 0)
            & (F.col("n_oov_free_words") <= F.col("n_words"))
        ).alias("coverage_valid"),
    )


_UNIGRAM_VOCAB_ENVELOPE_ORACLE = """
SELECT TRUE AS nonempty,
       TRUE AS within_cap,
       TRUE AS ranks_dense,
       TRUE AS pieces_distinct,
       TRUE AS pieces_len_valid,
       TRUE AS counts_nonneg,
       TRUE AS costs_positive
"""


@register("unigram_vocab_envelope", _UNIGRAM_VOCAB_ENVELOPE_ORACLE)
def unigram_vocab_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-oracle envelope for :func:`unigram_vocab` (the trained piece
    table, exactly replayable only via the udf-oracle trainer): one row
    of structural invariants any correct unigram-LM training run
    satisfies — non-empty vocabulary, size within the prune budget
    (``UNIGRAM_VOCAB``, or the single-char floor when the alphabet
    alone exceeds it — single chars are prune-exempt), dense ranks
    ``0..n-1``, distinct pieces, piece lengths in
    ``1..UNIGRAM_MAX_PIECE``, non-negative counts, and positive
    integer costs.  A trainer that over-prunes, loops, or emits
    malformed rows flips a flag and fails the hash gate;
    piece-for-piece equality stays on the udf-oracle + the pytest
    differential trainer.  The BPE twin is ``bpe_vocab_envelope``.
    """
    from pyspark.sql import functions as F

    v = unigram_vocab(spark, sf_dir)
    n = F.count(F.lit(1))
    n_singles = F.sum((F.length("piece") == 1).cast("long"))
    return v.agg(
        (n >= 1).alias("nonempty"),
        (n <= F.greatest(F.lit(UNIGRAM_VOCAB), n_singles)).alias(
            "within_cap"
        ),
        (
            (F.min("rank") == 0)
            & (F.max("rank") == n - 1)
            & (F.count_distinct("rank") == n)
        ).alias("ranks_dense"),
        (F.count_distinct("piece") == n).alias("pieces_distinct"),
        F.min(
            (F.length("piece") >= 1)
            & (F.length("piece") <= UNIGRAM_MAX_PIECE)
        ).alias("pieces_len_valid"),
        F.min(F.col("count") >= 0).alias("counts_nonneg"),
        F.min(F.col("cost_bits") > 0).alias("costs_positive"),
    )
