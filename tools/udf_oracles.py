"""DuckDB Python-UDF oracles for the hash-pipeline queries.

r1/r2 left five queries rows-only because their primitives
(``xxhash64``, seeded numpy projections, HLL) are not portable SQL.
This module closes four of the five: a pure-Python XXH64
(tools/xxh64.py, independent reimplementation of the public spec,
bit-verified against the JVM) is registered as DuckDB scalar UDFs, and
the full pipelines — shingling, affine minhash permutations, banding,
bucket self-joins, simhash bit votes, sign-random-projections — are
re-expressed as plain DuckDB SQL over those UDFs.

``approx_distinct_users`` stays rows-only by design: it RETURNS an
estimate (Spark's HLL++ with its specific bias correction); any oracle
would have to reimplement that exact sketch, which is a port, not an
independent check.  Its accuracy bound is asserted against the exact
distinct count in tests/test_hash_pipelines.py instead.

These oracles cannot ship in ``oracle_sql()`` (the driver's DuckDB
connection registers no UDFs), so tools/check_correctness.py runs them
as a supplementary tier recorded as ``udf-oracle`` in the committed
sweep artifact (CHECK_FULL_r*.json).
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.xxh64 import spark_xxhash64_longs, spark_xxhash64_str  # noqa: E402

# mirror the engine's constants (mr_python_spark/dedup/__init__.py)
MINHASH_HASHES = 64
MINHASH_BANDS = 16
MERSENNE_PRIME = (1 << 31) - 1
HASH_A = [2 * i + 1 for i in range(1, MINHASH_HASHES + 1)]
HASH_B = [1_000_003 * i + 12345 for i in range(MINHASH_HASHES)]
LSH_BUCKET_CAP = 64
RP_SLOT_BITS = 16
RP_TARGET_BUCKET = 32
RP_BUCKET_CAP = 2048
#: OR-amplification spec (mirrors mr_python_spark/dedup constants):
#: masked sub-band multi-probe — per-band collision is P(Hamming<=1) =
#: p0^bits + bits*p0^(bits-1)*(1-p0), p0 = 1 - acos(0.45)/pi; band
#: count L = ceil(ln(1/0.1) / p_band) capped at 128; band i draws its
#: 16-column Gaussian slot from RandomState(1000 + i) (deterministic
#: across platforms by contract); bucket key = mask*2^16 + masked_val
RP_DESIGN_P0 = 1 - math.acos(0.45) / math.pi
RP_DESIGN_MISS = 0.1
RP_MAX_BANDS = 128
RP_BAND_SEED = 1000
RP_MASK_STRIDE = 1 << RP_SLOT_BITS

_RP_SLOTS: dict[int, "np.ndarray"] = {}


def _rp_slot(band: int) -> "np.ndarray":
    P = _RP_SLOTS.get(band)
    if P is None:
        P = np.random.RandomState(RP_BAND_SEED + band).standard_normal(
            (64, RP_SLOT_BITS)
        )
        _RP_SLOTS[band] = P
    return P


def _rp_band_val(e, band: int, bpb: int) -> int:
    """Sign-projection full-band value, recomputed per row (independent
    of the engine's batched GEMM path)."""
    v = np.asarray(e, dtype=np.float64)
    bits = (v @ _rp_slot(band)[: len(v), :bpb]) >= 0.0
    return int(bits.astype(np.int64) @ (1 << np.arange(bpb)))


def _rp_mask_vals(e, band: int, bpb: int) -> list:
    """Masked sub-band bucket keys: for each mask i, the band's sign
    bits with bit i deleted and compressed, coded mask*2^16 + val —
    the engine's multi-probe emission (dedup/__init__.py band_rows),
    recomputed per row."""
    v = np.asarray(e, dtype=np.float64)
    bits = ((v @ _rp_slot(band)[: len(v), :bpb]) >= 0.0).astype(np.int64)
    w = 1 << np.arange(bpb - 1)
    return [
        int(np.delete(bits, i) @ w) + i * RP_MASK_STRIDE for i in range(bpb)
    ]


def _rp_num_bands(bpb: int) -> int:
    """OR-amplified band count for a band width (engine formula:
    multi-probe Hamming<=1 per-band collision)."""
    p_band = RP_DESIGN_P0**bpb + bpb * RP_DESIGN_P0 ** (bpb - 1) * (
        1.0 - RP_DESIGN_P0
    )
    return min(
        RP_MAX_BANDS, math.ceil(math.log(1.0 / RP_DESIGN_MISS) / p_band)
    )


# --- BPE tokenizer (bpe_token_stats / bpe_vocab_merges) ----------------

#: (sf_dir) -> (merges list, rank dict); independent reimplementation
#: of mr_python_spark.functions.bpe (Counter-based trainer over lists,
#: same total orders: max frequency then lexicographically smallest
#: pair; greedy lowest-rank leftmost encode)
_BPE_ORACLE_MODELS: dict[str, tuple] = {}


def _bpe_oracle_model() -> tuple:
    sf_dir = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
    model = _BPE_ORACLE_MODELS.get(sf_dir)
    if model is None:
        import re as _re
        from collections import Counter

        import duckdb

        # sample geometry is pipeline CONFIG, imported so a constant
        # change in functions/bpe.py cannot desynchronize the oracle;
        # the trainer algorithm below stays an independent reimpl
        from mr_python_spark.functions.bpe import (
            BPE_NUM_MERGES,
            BPE_SAMPLE_CAP,
            BPE_SAMPLE_STRIDE,
        )

        rows = duckdb.sql(
            f"""
            SELECT lower(text) FROM '{sf_dir}/documents.parquet'
            WHERE doc_id % {BPE_SAMPLE_STRIDE} = 0
            ORDER BY doc_id LIMIT {BPE_SAMPLE_CAP}
            """
        ).fetchall()
        wf: Counter = Counter()
        for (t,) in rows:
            for w in _re.split(r"\s+", t):
                if w:
                    wf[w] += 1
        vocab = [(list(w[:-1]) + [w[-1] + "</w>"], f) for w, f in wf.items()]
        merges: list[tuple[str, str]] = []
        for _ in range(BPE_NUM_MERGES):
            pc: Counter = Counter()
            for syms, f in vocab:
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += f
            if not pc:
                break
            bestf = max(pc.values())
            if bestf < 2:
                break
            best = min(p for p, f in pc.items() if f == bestf)
            merges.append(best)
            a, b = best
            for k, (syms, f) in enumerate(vocab):
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[k] = (out, f)
        alphabet = set()
        for w in wf:
            alphabet.update(w[:-1])
            alphabet.add(w[-1] + "</w>")
        model = (
            merges,
            {p: i for i, p in enumerate(merges)},
            alphabet | {a + b for a, b in merges},
            alphabet,
        )
        _BPE_ORACLE_MODELS[sf_dir] = model
    return model


def _bpe_merge_strs(dummy: int) -> list:
    merges = _bpe_oracle_model()[0]
    return [f"{i}\t{a}\t{b}\t{a}{b}" for i, (a, b) in enumerate(merges)]


def _bpe_stats(text: str) -> list:
    import re as _re

    _, ranks, vocab, _ = _bpe_oracle_model()
    words = [w for w in _re.split(r"\s+", text.lower()) if w]
    toks: list[str] = []
    n_cov = 0
    for w in words:
        syms = list(w[:-1]) + [w[-1] + "</w>"]
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        toks.extend(syms)
        n_cov += all(s in vocab for s in syms)
    return [len(words), len(toks), len(set(toks)), n_cov]



# --- unigram-LM tokenizer (unigram_token_stats / unigram_vocab) -------

#: (sf_dir) -> (pieces, counts, costs); independent reimplementation
#: of mr_python_spark.functions.unigram (Counter-based seeding, a
#: descending-i Viterbi with <=-replacement — same total orders:
#: (count DESC, piece ASC) selection, longest-last-piece ties)
_UNIGRAM_ORACLE_MODELS: dict[str, tuple] = {}


def _unigram_oracle_viterbi(word: str, costs: dict) -> list:
    from mr_python_spark.functions.unigram import (
        UNIGRAM_MAX_PIECE,
        UNIGRAM_UNK_COST,
    )

    n = len(word)
    dp = {0: 0}
    back = {}
    for j in range(1, n + 1):
        # descending i = shortest candidate first; <= replacement means
        # the last accepted (smallest i, longest piece) wins cost ties —
        # the same winner as the engine's ascending-i strict-< loop
        for i in range(j - 1, max(0, j - UNIGRAM_MAX_PIECE) - 1, -1):
            piece = word[i:j]
            c = costs.get(piece)
            if c is None:
                if len(piece) != 1:
                    continue
                c = UNIGRAM_UNK_COST
            cand = dp[i] + c
            if j not in dp or cand <= dp[j]:
                dp[j], back[j] = cand, i
    toks = []
    j = n
    while j:
        i = back[j]
        toks.append(word[i:j])
        j = i
    toks.reverse()
    return toks


def _unigram_oracle_model() -> tuple:
    sf_dir = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
    model = _UNIGRAM_ORACLE_MODELS.get(sf_dir)
    if model is None:
        import re as _re
        from collections import Counter

        import duckdb

        from mr_python_spark.functions.unigram import (
            UNIGRAM_EM_ITERS,
            UNIGRAM_MAX_PIECE,
            UNIGRAM_SEED_MULTI,
            UNIGRAM_VOCAB,
        )

        rows = duckdb.sql(
            f"""
            SELECT lower(text) FROM '{sf_dir}/documents.parquet'
            WHERE doc_id % {BPE_SAMPLE_STRIDE_I()} = 0
            ORDER BY doc_id LIMIT {BPE_SAMPLE_CAP_I()}
            """
        ).fetchall()
        wf: Counter = Counter()
        for (t,) in rows:
            for w in _re.split(r"\s+", t):
                if w:
                    wf[w] += 1

        seed: Counter = Counter()
        for w, f in wf.items():
            for i in range(len(w)):
                for ln in range(1, UNIGRAM_MAX_PIECE + 1):
                    if i + ln > len(w):
                        break
                    seed[w[i : i + ln]] += f
        chars = sorted(s for s in seed if len(s) == 1)
        multi = sorted(
            (s for s in seed if len(s) > 1), key=lambda s: (-seed[s], s)
        )[:UNIGRAM_SEED_MULTI]
        vocab = chars + multi
        counts = Counter({s: seed[s] for s in vocab})

        def cost_of(c, total, v):
            return ((total + v) // (c + 1)).bit_length()

        def em_pass(costs):
            nxt = Counter(dict.fromkeys(vocab, 0))
            for w, f in wf.items():
                for p in _unigram_oracle_viterbi(w, costs):
                    if p in nxt:
                        nxt[p] += f
            return nxt

        for _ in range(UNIGRAM_EM_ITERS):
            total, v = sum(counts.values()), len(vocab)
            counts = em_pass({s: cost_of(counts[s], total, v) for s in vocab})

        keep = sorted(
            (s for s in vocab if len(s) > 1), key=lambda s: (-counts[s], s)
        )[: max(0, UNIGRAM_VOCAB - len(chars))]
        vocab = chars + keep
        counts = Counter({s: counts[s] for s in vocab})
        total, v = sum(counts.values()), len(vocab)
        counts = em_pass({s: cost_of(counts[s], total, v) for s in vocab})
        total = sum(counts.values())
        costs = {s: cost_of(counts[s], total, v) for s in vocab}
        pieces = sorted(vocab, key=lambda s: (-counts[s], s))
        model = (pieces, dict(counts), costs)
        _UNIGRAM_ORACLE_MODELS[sf_dir] = model
    return model


def BPE_SAMPLE_STRIDE_I() -> int:
    from mr_python_spark.functions.bpe import BPE_SAMPLE_STRIDE

    return BPE_SAMPLE_STRIDE


def BPE_SAMPLE_CAP_I() -> int:
    from mr_python_spark.functions.bpe import BPE_SAMPLE_CAP

    return BPE_SAMPLE_CAP


def _unigram_vocab_rows(dummy: int) -> list:
    pieces, counts, costs = _unigram_oracle_model()
    return [
        f"{i}\t{s}\t{counts[s]}\t{costs[s]}" for i, s in enumerate(pieces)
    ]


def _unigram_stats(text: str) -> list:
    import re as _re

    _, _, costs = _unigram_oracle_model()
    words = [w for w in _re.split(r"\s+", text.lower()) if w]
    toks: list = []
    n_cov = 0
    for w in words:
        wt = _unigram_oracle_viterbi(w, costs)
        toks.extend(wt)
        n_cov += all(p in costs for p in wt)
    return [len(words), len(toks), len(set(toks)), n_cov]


def register_udfs(con) -> None:
    """Register the oracle UDFs on a DuckDB connection (idempotent)."""
    import duckdb
    from duckdb.typing import BIGINT, INTEGER, VARCHAR

    try:
        con.create_function(
            "xxh64_str", lambda s: spark_xxhash64_str(s), [VARCHAR], BIGINT
        )
        con.create_function(
            "xxh64_long4",
            lambda a, b, c, d: spark_xxhash64_longs(a, b, c, d),
            [BIGINT, BIGINT, BIGINT, BIGINT],
            BIGINT,
        )
        con.create_function(
            "rp_band_val",
            _rp_band_val,
            [duckdb.list_type(duckdb.typing.DOUBLE), INTEGER, INTEGER],
            BIGINT,
        )
        con.create_function(
            "rp_mask_vals",
            _rp_mask_vals,
            [duckdb.list_type(duckdb.typing.DOUBLE), INTEGER, INTEGER],
            duckdb.list_type(BIGINT),
        )
        con.create_function("rp_num_bands", _rp_num_bands, [INTEGER], INTEGER)
        con.create_function(
            "km_cell", _km_cell, [duckdb.list_type(duckdb.typing.DOUBLE)], INTEGER
        )
        con.create_function(
            "km_probe",
            _km_probe,
            [duckdb.list_type(duckdb.typing.DOUBLE)],
            duckdb.list_type(INTEGER),
        )
        con.create_function(
            "pq_cell", _pq_cell, [duckdb.list_type(duckdb.typing.DOUBLE)], INTEGER
        )
        con.create_function(
            "pq_probe",
            _pq_probe,
            [duckdb.list_type(duckdb.typing.DOUBLE)],
            duckdb.list_type(INTEGER),
        )
        con.create_function(
            "pq_code",
            _pq_code,
            [duckdb.list_type(duckdb.typing.DOUBLE)],
            duckdb.list_type(INTEGER),
        )
        con.create_function(
            "cosn",
            _cosn,
            [duckdb.list_type(duckdb.typing.DOUBLE), duckdb.list_type(duckdb.typing.DOUBLE)],
            duckdb.typing.DOUBLE,
        )
        con.create_function(
            "cell_cos",
            _cell_cos,
            [duckdb.list_type(duckdb.typing.DOUBLE)],
            duckdb.typing.DOUBLE,
        )
        con.create_function(
            "pq_adc",
            _pq_adc,
            [duckdb.list_type(duckdb.typing.DOUBLE), duckdb.list_type(INTEGER)],
            duckdb.typing.DOUBLE,
        )
        con.create_function(
            "bpe_stats", _bpe_stats, [VARCHAR], duckdb.list_type(INTEGER)
        )
        con.create_function(
            "bpe_merges", _bpe_merge_strs, [INTEGER], duckdb.list_type(VARCHAR)
        )
        con.create_function(
            "unigram_stats", _unigram_stats, [VARCHAR], duckdb.list_type(INTEGER)
        )
        con.create_function(
            "unigram_vocab_rows",
            _unigram_vocab_rows,
            [INTEGER],
            duckdb.list_type(VARCHAR),
        )
        con.create_function(
            "bpe_budget_stats",
            _bpe_budget_stats,
            [VARCHAR],
            duckdb.list_type(INTEGER),
        )
        con.create_function(
            "unigram_budget_stats",
            _unigram_budget_stats,
            [VARCHAR],
            duckdb.list_type(INTEGER),
        )
        con.create_function("zlib_bytes", _zlib_bytes, [VARCHAR], BIGINT)
    except Exception as e:  # already registered on this connection
        if "already" not in str(e).lower():
            raise


# shared prefix: whitespace tokens and distinct 3-gram shingles,
# the same construction the committed clusters oracle uses
_SHINGLES = r"""
toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM (
    SELECT doc_id, t, unnest(t) FROM toks
  )
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM pos WHERE i <= len(t) - 2
)
"""


def _minhash_sql() -> str:
    p = MERSENNE_PRIME
    mins = ",\n    ".join(
        f"MIN(({HASH_A[i]} * h + {HASH_B[i]}) % {p}) AS m{i}"
        for i in range(MINHASH_HASHES)
    )
    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, xxh64_long4({args}) AS bhash FROM sig".format(
            b=b,
            args=", ".join(f"m{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH {_SHINGLES},
h AS (
  SELECT doc_id, ((xxh64_str(shingle) % {p}) + {p}) % {p} AS h FROM sh
),
sig AS (
  SELECT doc_id,
    {mins}
  FROM h GROUP BY doc_id
),
bands AS (
  {band_selects}
),
small_buckets AS (
  -- mirror the engine's LSH_BUCKET_CAP: oversized buckets are dropped
  SELECT band, bhash FROM bands
  GROUP BY band, bhash HAVING count(*) <= {LSH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
  JOIN small_buckets s ON a.band = s.band AND a.bhash = s.bhash
),
shs AS (
  SELECT doc_id, list(shingle) AS sh FROM sh GROUP BY doc_id
)
SELECT doc_a, doc_b,
  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
FROM cand
JOIN shs sa ON doc_a = sa.doc_id
JOIN shs sb ON doc_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5
"""


def _simhash_sql() -> str:
    votes = ",\n    ".join(
        f"SUM(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    # bit 63 kept zero, matching the engine (signed-long safety)
    fp_expr = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)" for i in range(63)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, fp, {b} AS band, (fp >> {b * 16}) & 65535 AS bval FROM fp"
        for b in range(4)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
),
h AS (
  SELECT doc_id, xxh64_str(tok) AS h FROM tok
),
bits AS (
  SELECT doc_id,
    {votes}
  FROM h GROUP BY doc_id
),
fp AS (
  SELECT doc_id, {fp_expr} AS fp FROM bits
),
bands AS (
  {band_selects}
)
SELECT DISTINCT
  a.doc_id AS doc_a,
  b.doc_id AS doc_b,
  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 3
"""


def _fingerprint_sql() -> str:
    return r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS t
  FROM documents
)
SELECT doc_id, xxh64_str(array_to_string(t, ' ')) AS fingerprint FROM toks
"""


def _embedding_lsh_sql() -> str:
    # masked sub-band keys come from the rp_mask_vals UDF (same seeded
    # slots + recode, per-row recompute); band width mirrors the
    # engine's adaptive rule rp_bits_per_band(n) = clamp(4, 16,
    # ceil(log2(n / 32))), computed from count(*) so the oracle tracks
    # the engine at any SF.  The canonical-emission rule (Hamming-0
    # pairs, equal fval, count only at mask 0) is mirrored so the
    # bucket-cap filter interacts identically on both engines.
    return f"""
WITH p AS (
  SELECT CASE WHEN count(*) <= {RP_TARGET_BUCKET} THEN 4
         ELSE GREATEST(4, LEAST({RP_SLOT_BITS},
              CAST(ceil(log2(count(*) / {RP_TARGET_BUCKET}.0)) AS INTEGER)))
         END AS bpb
  FROM embeddings
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
bands_raw AS (
  SELECT vec_id, CAST(band AS INTEGER) AS band,
         rp_band_val(e, CAST(band AS INTEGER), CAST((SELECT bpb FROM p) AS INTEGER)) AS fval,
         rp_mask_vals(e, CAST(band AS INTEGER), CAST((SELECT bpb FROM p) AS INTEGER)) AS mvals
  FROM v CROSS JOIN (
    SELECT unnest(range((SELECT rp_num_bands(CAST(bpb AS INTEGER)) FROM p))) AS band
  ) t
),
bands AS (
  SELECT vec_id, band, fval, unnest(mvals) AS bval FROM bands_raw
),
ok_buckets AS (
  SELECT band, bval FROM bands
  GROUP BY band, bval HAVING count(*) <= {RP_BUCKET_CAP}
),
kept AS (
  SELECT bands.* FROM bands JOIN ok_buckets USING (band, bval)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
  WHERE a.fval <> b.fval OR a.bval < {RP_MASK_STRIDE}
),
n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
)
SELECT vec_a, vec_b
FROM cand
JOIN n a ON vec_a = a.vec_id
JOIN n b ON vec_b = b.vec_id
WHERE list_sum(list_transform(list_zip(a.e, b.e), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (a.nrm * b.nrm) >= 0.4
"""


# --- trained-quantizer IVF (ann_ivf_kmeans) ---------------------------
# mirror the engine's spec (mr_python_spark/similarity/__init__.py):
# sample = vec_id % stride == 0, ordered, first 1024; first-k init;
# 5 Lloyd rounds; argmin ties to the lowest cell; empty cells frozen;
# cell count corpus-adaptive (~KM_TARGET_CELL vectors per cell).
KM_CELLS = 16
KM_ITERS = 5
KM_SAMPLE_STRIDE = 7
KM_SAMPLE_CAP = 2048
KM_PROBE_CELLS = 4
KM_QUERY_STRIDE = 50


def ANN_QUERY_CAP() -> int:
    """Mirror the engine's query-set cap (round 15: the stride subset
    is additionally capped to a fixed size so the broadcast build side
    is constant at any SF; both engines must cap alike)."""
    from mr_python_spark.similarity import ANN_QUERY_CAP as cap

    return cap
KM_TOP_K = 3
KM_TARGET_CELL = 128
KM_MAX_CELLS = 512


def _ivf_cells(n: int) -> int:
    return min(KM_MAX_CELLS, max(KM_CELLS, -(-n // KM_TARGET_CELL)))

#: centroid matrices keyed by sf_dir (training reads the parquet
#: directly; the harness exposes the SF under test via this env var)
_KM_CENTROIDS: dict[str, "np.ndarray"] = {}


def _km_centroids() -> "np.ndarray":
    sf_dir = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
    C = _KM_CENTROIDS.get(sf_dir)
    if C is None:
        import duckdb

        rows = duckdb.sql(
            f"""
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM '{sf_dir}/embeddings.parquet'
            WHERE vec_id % {KM_SAMPLE_STRIDE} = 0
            ORDER BY vec_id LIMIT {KM_SAMPLE_CAP}
            """
        ).fetchall()
        X = np.array([r[0] for r in rows], dtype=np.float64)
        n_corpus = duckdb.sql(
            f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        k = min(_ivf_cells(n_corpus), len(X))
        C = X[:k].copy()
        for _ in range(KM_ITERS):
            a = ((C * C).sum(1) - 2.0 * (X @ C.T)).argmin(1)
            for j in range(k):
                members = X[a == j]
                if len(members):
                    C[j] = members.mean(0)
        _KM_CENTROIDS[sf_dir] = C
    return C


def _cell_distances(v: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """Same GEMM-identity surrogate as the engine's cell_distances:
    ||c||^2 - 2 v.c (the ||v||^2 term is constant per row)."""
    return (C * C).sum(1) - 2.0 * (C @ v)


def _km_cell(e) -> int:
    C = _km_centroids()
    d = _cell_distances(np.asarray(e, dtype=np.float64), C)
    return int(d.argmin())


def _km_probe(e) -> list:
    C = _km_centroids()
    d = _cell_distances(np.asarray(e, dtype=np.float64), C)
    return [int(c) for c in np.argsort(d, kind="stable")[:KM_PROBE_CELLS]]


# --- IVF-PQ (ann_ivf_pq) ----------------------------------------------
# mirrors mr_python_spark/similarity/__init__.py: the NORMALIZED sample
# trains both the coarse quantizer and the per-subspace codebooks
PQ_M = 8
PQ_KS = 16
PQ_RERANK = 25

_PQ_MODELS: dict[str, tuple] = {}


def _pq_model() -> tuple:
    sf_dir = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
    model = _PQ_MODELS.get(sf_dir)
    if model is None:
        import duckdb

        rows = duckdb.sql(
            f"""
            SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM '{sf_dir}/embeddings.parquet'
            WHERE vec_id % {KM_SAMPLE_STRIDE} = 0
            ORDER BY vec_id LIMIT {KM_SAMPLE_CAP}
            """
        ).fetchall()
        X = np.array([r[0] for r in rows], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        n_corpus = duckdb.sql(
            f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        k = min(_ivf_cells(n_corpus), len(Xn))
        C = Xn[:k].copy()
        for _ in range(KM_ITERS):
            a = ((C * C).sum(1) - 2.0 * (Xn @ C.T)).argmin(1)
            for j in range(k):
                members = Xn[a == j]
                if len(members):
                    C[j] = members.mean(0)
        dsub = Xn.shape[1] // PQ_M
        books = []
        for m in range(PQ_M):
            S = Xn[:, m * dsub : (m + 1) * dsub]
            kb = min(PQ_KS, len(S))
            B = S[:kb].copy()
            for _ in range(KM_ITERS):
                d = ((S[:, None, :] - B[None, :, :]) ** 2).sum(-1)
                a = d.argmin(1)
                for j in range(kb):
                    members = S[a == j]
                    if len(members):
                        B[j] = members.mean(0)
            books.append(B)
        model = (C, np.stack(books), dsub)
        _PQ_MODELS[sf_dir] = model
    return model


def semantic_assignments(sf_dir: str):
    """(normalized embedding matrix, trained-cell assignment) for every
    vector at ``sf_dir`` — the inputs the SemDeDup boundary-margin
    analysis needs (tests/test_determinism.py pins that no
    within-cluster cosine sits on the SEM_TAU gate boundary)."""
    import duckdb

    prev = os.environ.get("SPARK_GRAFT_CHECK_SF")
    os.environ["SPARK_GRAFT_CHECK_SF"] = sf_dir
    try:
        C, _, _ = _pq_model()
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_CHECK_SF", None)
        else:
            os.environ["SPARK_GRAFT_CHECK_SF"] = prev
    rows = duckdb.sql(
        f"""
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id
        """
    ).fetchall()
    M = np.array([r[1] for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    cells = np.array([_cell_distances(v, C).argmin() for v in Mn])
    return Mn, cells


def _cosn(a, b) -> float:
    """Cosine of two raw vectors via per-vector normalize + dot —
    the same float64 sequence as the engine's per-cluster GEMM rows."""
    va = np.asarray(a, dtype=np.float64)
    vb = np.asarray(b, dtype=np.float64)
    return float((va / np.linalg.norm(va)) @ (vb / np.linalg.norm(vb)))


def _normed(e) -> "np.ndarray":
    v = np.asarray(e, dtype=np.float64)
    return v / np.linalg.norm(v)


def _pq_cell(e) -> int:
    C, _, _ = _pq_model()
    return int(_cell_distances(_normed(e), C).argmin())


def _pq_probe(e) -> list:
    C, _, _ = _pq_model()
    d = _cell_distances(_normed(e), C)
    return [int(c) for c in np.argsort(d, kind="stable")[:KM_PROBE_CELLS]]


def _pq_code(e) -> list:
    _, books, dsub = _pq_model()
    vn = _normed(e)
    return [
        int(((vn[m * dsub : (m + 1) * dsub][None, :] - books[m]) ** 2).sum(-1).argmin())
        for m in range(PQ_M)
    ]



def _cell_cos(e) -> float:
    """Cosine to the assigned (normalized-trained) centroid — the
    prototypicality metric.  IDENTICAL float64 sequence to the
    engine's per-row scoring (normalize, 1-D dot, one divide), so the
    downstream floor quantization matches bit-for-bit."""
    C, _, _ = _pq_model()
    vn = _normed(e)
    cell = int(_cell_distances(vn, C).argmin())
    return float(np.dot(vn, C[cell]) / np.linalg.norm(C[cell]))


def _pq_adc(qe, code) -> float:
    """ADC score: Σ_m <q_m, codebook[m][code_m]>, accumulated in
    subspace order — the same left-to-right double additions as the
    engine's ``aggregate(transform(code, ...))``, so bits match."""
    _, books, dsub = _pq_model()
    qn = _normed(qe)
    acc = 0.0
    for m, c in enumerate(code):
        acc += float(books[m][c] @ qn[m * dsub : (m + 1) * dsub])
    return acc


def _ann_ivf_pq_sql() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
), enc AS (
  SELECT vec_id, pq_cell(e) AS cell, pq_code(e) AS code, e, nrm FROM n
), q AS (
  -- cap BEFORE the unnest: DuckDB applies LIMIT after unnest expansion,
  -- so capping in the same SELECT would count (query, probed-cell) rows
  -- instead of queries and diverge from the engine's per-query cap
  SELECT vec_id AS query_id, unnest(pq_probe(e)) AS cell, e AS qe, nrm AS qnrm
  FROM (SELECT * FROM n WHERE vec_id % {KM_QUERY_STRIDE} = 0
        ORDER BY vec_id LIMIT {ANN_QUERY_CAP()})
), approx AS (
  SELECT
    q.query_id,
    enc.vec_id AS neighbor_id,
    pq_adc(q.qe, enc.code) AS adc_score,
    q.qe, q.qnrm, enc.e AS ne, enc.nrm AS nnrm
  FROM q JOIN enc ON q.cell = enc.cell AND q.query_id <> enc.vec_id
), shortlist AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id
    ) AS srank FROM approx
  ) WHERE srank <= {PQ_RERANK}
), reranked AS (
  SELECT
    query_id,
    neighbor_id,
    list_sum(list_transform(list_zip(qe, ne), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (qnrm * nnrm) AS score
  FROM shortlist
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM reranked
)
WHERE rank <= {KM_TOP_K}
"""


def _ann_pq_recall_sql() -> str:
    """Recall@3 of the PQ pipeline vs exact truth — composes the
    passing ann_ivf_pq udf-oracle (approx) with the ann_recall_report
    oracle's exact-truth CTE, hit-counted per query."""
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
), q0 AS (
  SELECT * FROM n WHERE vec_id % {KM_QUERY_STRIDE} = 0 ORDER BY vec_id LIMIT {ANN_QUERY_CAP()}
), truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q0.vec_id AS query_id, n.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q0.vec_id
             ORDER BY list_sum(list_transform(list_zip(q0.e, n.e),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                      / (q0.nrm * n.nrm) DESC, n.vec_id) AS rank
    FROM q0 JOIN n ON q0.vec_id <> n.vec_id
  ) WHERE rank <= {KM_TOP_K}
), enc AS (
  SELECT vec_id, pq_cell(e) AS cell, pq_code(e) AS code, e, nrm FROM n
), qp AS (
  -- cap BEFORE the unnest: DuckDB applies LIMIT after unnest expansion,
  -- so capping in the same SELECT would count (query, probed-cell) rows
  -- instead of queries and diverge from the engine's per-query cap
  SELECT vec_id AS query_id, unnest(pq_probe(e)) AS cell, e AS qe, nrm AS qnrm
  FROM (SELECT * FROM n WHERE vec_id % {KM_QUERY_STRIDE} = 0
        ORDER BY vec_id LIMIT {ANN_QUERY_CAP()})
), adc AS (
  SELECT
    qp.query_id,
    enc.vec_id AS neighbor_id,
    pq_adc(qp.qe, enc.code) AS adc_score,
    qp.qe, qp.qnrm, enc.e AS ne, enc.nrm AS nnrm
  FROM qp JOIN enc ON qp.cell = enc.cell AND qp.query_id <> enc.vec_id
), shortlist AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id
    ) AS srank FROM adc
  ) WHERE srank <= {PQ_RERANK}
), reranked AS (
  SELECT
    query_id,
    neighbor_id,
    list_sum(list_transform(list_zip(qe, ne), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (qnrm * nnrm) AS score
  FROM shortlist
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
    FROM reranked
  ) WHERE rank <= {KM_TOP_K}
)
SELECT t.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST(COUNT(a.neighbor_id) AS DOUBLE) / {KM_TOP_K} AS recall_at_3
FROM truth t
LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id
"""


def _ann_ivf_kmeans_sql() -> str:
    # cosine formulation copied from the passing ann_brute_topk oracle
    # (list_zip product sum / norms) so score bits match the engine's
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), n AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v
), cells AS (
  SELECT vec_id, km_cell(e) AS cell, e, nrm FROM n
), q AS (
  -- cap BEFORE the unnest: DuckDB applies LIMIT after unnest expansion,
  -- so capping in the same SELECT would count (query, probed-cell) rows
  -- instead of queries and diverge from the engine's per-query cap
  SELECT vec_id AS query_id, unnest(km_probe(e)) AS cell, e AS qe, nrm AS qnrm
  FROM (SELECT * FROM n WHERE vec_id % {KM_QUERY_STRIDE} = 0
        ORDER BY vec_id LIMIT {ANN_QUERY_CAP()})
), scored AS (
  SELECT
    q.query_id,
    cells.vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q.qe, cells.e), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (q.qnrm * cells.nrm) AS score
  FROM q JOIN cells ON q.cell = cells.cell AND q.query_id <> cells.vec_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {KM_TOP_K}
"""



def _minhash_est_envelope_sql() -> str:
    """Estimator-precision envelope: the LSH dedup's verified pairs
    (nested CTE = the full _minhash_sql), signatures rebuilt with the
    same affine family, matches counted position-for-position, and
    the binomial 3-sigma flag via the engine's exact IEEE sequence."""
    p = MERSENNE_PRIME
    mins = ",\n    ".join(
        f"MIN(({HASH_A[i]} * h + {HASH_B[i]}) % {p}) AS m{i}"
        for i in range(MINHASH_HASHES)
    )
    match_sum = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END"
        for i in range(MINHASH_HASHES)
    )
    return f"""
WITH pairs AS ({_minhash_sql()}),
h AS (
  SELECT doc_id, ((xxh64_str(shingle) % {p}) + {p}) % {p} AS h
  FROM (WITH {_SHINGLES} SELECT * FROM sh)
),
sig AS (
  SELECT doc_id,
    {mins}
  FROM h GROUP BY doc_id
),
m AS (
  SELECT pr.doc_a, pr.doc_b, pr.jaccard,
         CAST({match_sum} AS BIGINT) AS matches
  FROM pairs pr
  JOIN sig a ON pr.doc_a = a.doc_id
  JOIN sig b ON pr.doc_b = b.doc_id
)
SELECT doc_a, doc_b, matches,
       CAST(floor(jaccard * 1048576) AS BIGINT) AS true_fp,
       (abs(CAST(matches AS DOUBLE) / 64.0 - jaccard)
          <= 3.0 * sqrt(jaccard * (1.0 - jaccard) / 64.0) + (1.0 / 128.0))
         AS within_3sigma
FROM m
"""


def _inc_minhash_sql() -> str:
    """Asymmetric batch-probes-corpus variant of :func:`_minhash_sql`:
    candidates pair batch docs (doc_id % 10 = 0) with corpus docs in
    the same (band, bhash) bucket; corpus-side buckets over the cap
    are dropped, mirroring the engine."""
    p = MERSENNE_PRIME
    mins = ",\n    ".join(
        f"MIN(({HASH_A[i]} * h + {HASH_B[i]}) % {p}) AS m{i}"
        for i in range(MINHASH_HASHES)
    )
    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, xxh64_long4({args}) AS bhash FROM sig".format(
            b=b,
            args=", ".join(f"m{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH {_SHINGLES},
h AS (
  SELECT doc_id, ((xxh64_str(shingle) % {p}) + {p}) % {p} AS h FROM sh
),
sig AS (
  SELECT doc_id,
    {mins}
  FROM h GROUP BY doc_id
),
bands AS (
  {band_selects}
),
small_corpus_buckets AS (
  SELECT band, bhash FROM bands WHERE doc_id % 10 <> 0
  GROUP BY band, bhash HAVING count(*) <= {LSH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bhash = b.bhash
    AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
  JOIN small_corpus_buckets s ON a.band = s.band AND a.bhash = s.bhash
),
shs AS (
  SELECT doc_id, list(shingle) AS sh FROM sh GROUP BY doc_id
)
SELECT doc_new, doc_old,
  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
FROM cand
JOIN shs sa ON doc_new = sa.doc_id
JOIN shs sb ON doc_old = sb.doc_id
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
    / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5
"""



def _sem_dedup_sql() -> str:
    """SemDeDup oracle: pq_cell IS the engine's normalized-trained
    coarse quantizer (same sample, same Lloyd); a vector is kept iff
    no lower-id vector in its cell has cosine >= 0.4 (SEM_TAU)."""
    return """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), c AS (
  SELECT vec_id, e, pq_cell(e) AS cell FROM v
)
SELECT a.vec_id, a.cell,
       NOT EXISTS (
         SELECT 1 FROM c b
         WHERE b.cell = a.cell AND b.vec_id < a.vec_id
           AND cosn(a.e, b.e) >= 0.4
       ) AS is_kept
FROM c a
"""



def _sem_lang_sql() -> str:
    """Language-constrained SemDeDup oracle: same cell assignment and
    cosine rule as _sem_dedup_sql, but the EXISTS is additionally
    restricted to same-lang rows (documents joined on doc_id=vec_id)."""
    return """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), c AS (
  SELECT v.vec_id, d.lang, v.e, pq_cell(v.e) AS cell
  FROM v JOIN documents d ON d.doc_id = v.vec_id
  WHERE d.lang IS NOT NULL
)
SELECT a.vec_id, a.cell, a.lang,
       NOT EXISTS (
         SELECT 1 FROM c b
         WHERE b.cell = a.cell AND b.lang = a.lang AND b.vec_id < a.vec_id
           AND cosn(a.e, b.e) >= 0.4
       ) AS is_kept
FROM c a
"""



def _lsh_eval_sql() -> str:
    """LSH recall report oracle: exact-truth pairs (jaccard >= 0.5 over
    string shingles) left-joined against the minhash-LSH result set."""
    return f"""
WITH found AS (
{_minhash_sql()}
),
{_SHINGLES.lstrip()},
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT doc_a, doc_b,
         CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
  FROM pairs
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
)
SELECT t.doc_a, t.doc_b, t.jaccard,
       (f.doc_a IS NOT NULL) AS found_by_lsh
FROM truth t
LEFT JOIN found f ON f.doc_a = t.doc_a AND f.doc_b = t.doc_b
"""


def _rp_lsh_eval_sql() -> str:
    """RP-LSH recall report oracle: exact-truth pairs (cosine >= 0.4)
    left-joined against the adaptive-band embedding-LSH result set."""
    return f"""
WITH found AS (
{_embedding_lsh_sql()}
),
tv AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
tn AS (
  SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM tv
),
truth AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_sum(list_transform(list_zip(a.e, b.e),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (a.nrm * b.nrm) AS cosine
  FROM tn a JOIN tn b ON a.vec_id < b.vec_id
  WHERE list_sum(list_transform(list_zip(a.e, b.e),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
          / (a.nrm * b.nrm) >= 0.4
)
SELECT t.vec_a, t.vec_b, t.cosine,
       (f.vec_a IS NOT NULL) AS found_by_rp_lsh
FROM truth t
LEFT JOIN found f ON f.vec_a = t.vec_a AND f.vec_b = t.vec_b
"""


def _bpe_stats_sql() -> str:
    return """
SELECT doc_id,
       s[1] AS n_words,
       s[2] AS n_bpe_tokens,
       s[3] AS n_unique_bpe_tokens,
       s[4] AS n_oov_free_words
FROM (SELECT doc_id, bpe_stats(text) AS s FROM documents)
"""


def _bpe_merges_sql() -> str:
    return """
SELECT CAST(string_split(s, chr(9))[1] AS INTEGER) AS rank,
       string_split(s, chr(9))[2] AS "left",
       string_split(s, chr(9))[3] AS "right",
       string_split(s, chr(9))[4] AS merged
FROM (SELECT unnest(bpe_merges(1)) AS s)
"""


def _unigram_stats_sql() -> str:
    return """
SELECT doc_id,
       s[1] AS n_words,
       s[2] AS n_unigram_tokens,
       s[3] AS n_unique_pieces,
       s[4] AS n_oov_free_words
FROM (SELECT doc_id, unigram_stats(text) AS s FROM documents)
"""


def _unigram_vocab_sql() -> str:
    return """
SELECT CAST(string_split(s, chr(9))[1] AS INTEGER) AS rank,
       string_split(s, chr(9))[2] AS piece,
       CAST(string_split(s, chr(9))[3] AS BIGINT) AS count,
       CAST(string_split(s, chr(9))[4] AS INTEGER) AS cost_bits
FROM (SELECT unnest(unigram_vocab_rows(1)) AS s)
"""


def _bpe_fertility_sql() -> str:
    return """
WITH s AS (
  SELECT doc_id, st[1] AS n_words, st[2] AS n_bpe_tokens
  FROM (SELECT doc_id, bpe_stats(text) AS st FROM documents)
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.n_words) AS BIGINT) AS n_words,
       CAST(SUM(s.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(s.n_bpe_tokens) AS DOUBLE) / NULLIF(SUM(s.n_words), 0)
         AS fertility,
       CAST(SUM(d.n_chars) AS DOUBLE) / NULLIF(SUM(s.n_bpe_tokens), 0)
         AS chars_per_token
FROM s JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


def _bakeoff_budget_models() -> tuple:
    """(bpe_ranks, bpe_vocab, uni_costs) at the matched bake-off budget
    — mirrors budgeted_bpe_model / budgeted_unigram_costs: the K-merge
    prefix (greedy BPE training is sequential, so the prefix IS the
    budget-K model) and the rank-order unigram prune with refreshed
    costs."""
    from mr_python_spark.functions.unigram import BAKEOFF_EXTRA_PIECES

    merges, _, _, alphabet = _bpe_oracle_model()
    b = merges[:BAKEOFF_EXTRA_PIECES]
    b_ranks = {p: i for i, p in enumerate(b)}
    b_vocab = set(alphabet) | {a + x for a, x in b}
    pieces, counts, _ = _unigram_oracle_model()
    keep = [p for p in pieces if len(p) == 1]
    keep += [p for p in pieces if len(p) > 1][:BAKEOFF_EXTRA_PIECES]
    total, v = sum(counts[p] for p in keep), len(keep)
    u_costs = {p: ((total + v) // (counts[p] + 1)).bit_length() for p in keep}
    return b_ranks, b_vocab, u_costs


def _bpe_budget_stats(text: str) -> list:
    import re as _re

    ranks, vocab, _ = _bakeoff_budget_models()
    words = [w for w in _re.split(r"\s+", text.lower()) if w]
    n_tok = n_cov = 0
    for w in words:
        syms = list(w[:-1]) + [w[-1] + "</w>"]
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        n_tok += len(syms)
        n_cov += all(s in vocab for s in syms)
    return [len(words), n_tok, n_cov]


def _unigram_budget_stats(text: str) -> list:
    import re as _re

    _, _, costs = _bakeoff_budget_models()
    words = [w for w in _re.split(r"\s+", text.lower()) if w]
    n_tok = n_cov = 0
    for w in words:
        wt = _unigram_oracle_viterbi(w, costs)
        n_tok += len(wt)
        n_cov += all(p in costs for p in wt)
    return [len(words), n_tok, n_cov]


def _bakeoff_sql() -> str:
    # one join of the two budgeted stats frames + docs metadata, like
    # the engine
    return """
WITH b AS (
  SELECT doc_id, st[1] AS n_words, st[2] AS bpe_toks, st[3] AS bpe_cov
  FROM (SELECT doc_id, bpe_budget_stats(text) AS st FROM documents)
), u AS (
  SELECT doc_id, st[2] AS uni_toks, st[3] AS uni_cov
  FROM (SELECT doc_id, unigram_budget_stats(text) AS st FROM documents)
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(b.n_words) AS BIGINT) AS n_words,
       CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(b.bpe_toks) AS BIGINT) AS bpe_tokens,
       CAST(SUM(u.uni_toks) AS BIGINT) AS unigram_tokens,
       CAST(SUM(b.bpe_cov) AS BIGINT) AS bpe_oov_free_words,
       CAST(SUM(u.uni_cov) AS BIGINT) AS unigram_oov_free_words,
       -- NULLIF guards mirror the engine's when(denom > 0) so both
       -- sides pin degenerate (all-whitespace) languages to NULL
       CAST(SUM(b.bpe_toks) AS DOUBLE) / NULLIF(CAST(SUM(b.n_words) AS DOUBLE), 0)
         AS bpe_fertility,
       CAST(SUM(u.uni_toks) AS DOUBLE) / NULLIF(CAST(SUM(b.n_words) AS DOUBLE), 0)
         AS unigram_fertility,
       CAST(SUM(d.n_chars) AS DOUBLE) / NULLIF(CAST(SUM(b.bpe_toks) AS DOUBLE), 0)
         AS bpe_chars_per_token,
       CAST(SUM(d.n_chars) AS DOUBLE) / NULLIF(CAST(SUM(u.uni_toks) AS DOUBLE), 0)
         AS unigram_chars_per_token,
       CAST(SUM(b.bpe_cov) AS DOUBLE) / NULLIF(CAST(SUM(b.n_words) AS DOUBLE), 0)
         AS bpe_oov_free_rate,
       CAST(SUM(u.uni_cov) AS DOUBLE) / NULLIF(CAST(SUM(b.n_words) AS DOUBLE), 0)
         AS unigram_oov_free_rate
FROM b JOIN u USING (doc_id) JOIN documents d USING (doc_id)
GROUP BY d.lang
"""



def _proto_sql() -> str:
    """Prototypicality oracle: pq_cell/cell_cos are the independent
    numpy reimplementations of the engine's trained quantizer and
    per-row centroid cosine; rank/count/prune are integer SQL."""
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), c AS (
  SELECT vec_id, pq_cell(e) AS cell,
         CAST(floor((1.0 + cell_cos(e)) * {1 << 20}) AS BIGINT) AS cos_fp
  FROM v
)
SELECT vec_id, cell, cos_fp,
  CAST(row_number() OVER w AS BIGINT) AS proto_rank,
  CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell,
  (row_number() OVER w * 4 <= COUNT(*) OVER (PARTITION BY cell)) AS pruned
FROM c
WINDOW w AS (PARTITION BY cell ORDER BY cos_fp DESC, vec_id ASC)
"""


def udf_oracles() -> dict[str, str]:
    """name -> DuckDB SQL requiring :func:`register_udfs` on the connection."""
    return {
        "dedup_minhash_lsh": _minhash_sql(),
        "dedup_minhash_estimate_envelope": _minhash_est_envelope_sql(),
        "dedup_incremental_minhash": _inc_minhash_sql(),
        "dedup_simhash": _simhash_sql(),
        "doc_fingerprint": _fingerprint_sql(),
        "dedup_embedding_lsh": _embedding_lsh_sql(),
        "ann_ivf_kmeans": _ann_ivf_kmeans_sql(),
        "ann_ivf_pq": _ann_ivf_pq_sql(),
        "ann_pq_recall_report": _ann_pq_recall_sql(),
        "bpe_token_stats": _bpe_stats_sql(),
        "bpe_vocab_merges": _bpe_merges_sql(),
        "tokenizer_fertility_report": _bpe_fertility_sql(),
        "unigram_token_stats": _unigram_stats_sql(),
        "unigram_vocab": _unigram_vocab_sql(),
        "tokenizer_bakeoff_report": _bakeoff_sql(),
        "dedup_semantic": _sem_dedup_sql(),
        "prototypicality_rank": _proto_sql(),
        "dedup_semantic_within_lang": _sem_lang_sql(),
        "dedup_lsh_eval_report": _lsh_eval_sql(),
        "dedup_rp_lsh_eval_report": _rp_lsh_eval_sql(),
        "compression_ratio_quality": _zratio_sql(),
    }


def _zlib_bytes(s: str) -> int:
    """Compressed size of the UTF-8 text under zlib level 6 — the same
    CPython zlib the engine's mapInPandas pass calls, so the DEFLATE
    byte stream (and its length) is identical by construction."""
    import zlib

    return len(zlib.compress(s.encode("utf-8"), 6))


def _zratio_sql() -> str:
    # mirrors mr_python_spark/functions/text.py::compression_ratio_quality
    from mr_python_spark.functions.text import _ZRATIO_FLAG_BP

    return f"""
WITH z AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS raw_bytes,
         zlib_bytes(text) AS zip_bytes
  FROM documents
)
SELECT doc_id, raw_bytes, zip_bytes,
       (zip_bytes * 10000) // GREATEST(raw_bytes, 1) AS ratio_bp,
       ((zip_bytes * 10000) // GREATEST(raw_bytes, 1)) < {_ZRATIO_FLAG_BP}
         AS flag_repetitive
FROM z
"""
