"""Partitioning-independence: results must be bit-identical under
different shuffle layouts.

The engine claims its float-producing queries are deterministic under
ANY partitioning (exact fixed-point accumulation, total orderings on
every limit — registry.py docstring).  That claim is what makes the
DuckDB gate meaningful AND what a 1000-executor run relies on: a
re-run with different parallelism must not change a single bit.
Verified here by executing each query under two very different
``spark.sql.shuffle.partitions`` settings and comparing collected
results exactly (no tolerance).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"

#: queries whose floats come from multi-row accumulation — the ones a
#: partitioning change would perturb if the fixed-point claims were wrong
QUERIES = [
    "q1_pricing_summary",
    "q5_local_supplier",
    "stats_variance_quantity",
    "corr_quantity_price",
    "pivot_daily_event_values",
    "tfidf_top_terms",
    "dedup_ngram_jaccard",
    "window_percent_rank",
    "agg_minmax_by",
    "doc_length_quantiles",
    # round-3 pipeline passes: every float is a single division of
    # exact integer counts, so partitioning must not move a bit
    "quality_repetition",
    "doc_rarity_score",
    "docs_quality_filter",
    # round-7 hardening: integer-unit centroid means (the sf1 sweep
    # caught the decimal→double conversion diverging past 2^53), the
    # rewritten normalized-dot LSH verification, and the RP recall
    # report's sequential-fold cosine column
    "label_centroids",
    "dedup_embedding_lsh",
    "dedup_rp_lsh_eval_report",
    "char_diversity_quality",
    # round-9 additions: envelope flags must not flip with layout, and
    # the BPE merge table / subword counts are layout-independent by
    # construction (driver-side training on an ORDER BY sample)
    "dedup_incremental_minhash_envelope",
    "dedup_semantic_envelope",
    "bpe_token_stats",
    # round-9 second-wave scorers: DSIR's per-doc bit sums, the BM25
    # ranking's fixed-point scores, and the isqrt mixture shares are
    # all exact-integer until a final division — layout must not move
    # a bit (nor reorder the BM25 top-k, which ties on doc_id)
    "dsir_importance_weights",
    "search_bm25_topk",
    "mixture_temperature_weights",
    # the sketch is an exact-integer aggregate under the fixed md5
    # family; the kNN report's floats only ORDER neighbors (the
    # ann_brute contract) before exact-integer voting
    "cms_heavy_hitters",
    "knn_label_eval",
    "hard_negative_mining",
    # the budget threshold's crossing row must not move with layout
    # (double ordering + exact integer running mass), and the
    # agreement counts compose two exact pair tiers
    "quality_token_budget",
    "dedup_lexical_semantic_agreement",
    # round-9 fourth wave: NTILE over a total fixed-point order, the
    # in-array phrase counts + doc_id-tied top-k, quantized-jaccard
    # provenance sums, and the all-integer vocab-growth table
    "ccnet_perplexity_buckets",
    "search_phrase_topk",
    "dedup_cross_source_matrix",
    "vocab_growth_report",
    # fifth wave: shard load shares and trigram-OOV masses are exact
    # fixed-point integers over deterministic hash/batch splits
    "shard_balance_report",
    "incremental_oov_report",
    # sixth wave: the mined-bitext table is integer arithmetic from the
    # one quantization at the GEMM boundary on, and the ablation curve's
    # distributed rank + fixed-point shares must not move with layout
    "bitext_margin_mining",
    "quality_ablation_curve",
]


@pytest.fixture(scope="module")
def entrymod(spark):
    import __spark_entry__ as m

    return m


def _run_sorted(spark, fn, n_parts: int):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        pdf = fn(spark, SF).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


@pytest.mark.parametrize("name", QUERIES)
def test_partitioning_independent(spark, entrymod, name):
    fn = entrymod.queries()[name]
    a = _run_sorted(spark, fn, 3)
    b = _run_sorted(spark, fn, 32)
    # exact equality — floats included; NaN == NaN via fillna sentinel
    a, b = a.fillna("<NULL>"), b.fillna("<NULL>")
    assert a.equals(b), f"{name}: results differ between 3 and 32 shuffle partitions"


@pytest.mark.parametrize("name", ["dedup_ngram_jaccard", "dedup_containment"])
def test_verify_broadcast_gate_off_identical(spark, entrymod, monkeypatch, name):
    """The size-gated broadcast on the pruned verification frame is a
    pure physical-plan choice: with the gate forced OFF (the >100 TB
    path, where sh_small outgrows the broadcast limit and AQE picks a
    shuffled join) the pair set must be bit-identical, and with stats
    broadcasting also disabled the plan must carry ZERO forced
    broadcasts — mirroring the partitioning-independence contract for
    the join-strategy axis."""
    from tools.explain_audit import count_broadcast_exchanges

    import mr_python_spark.dedup as dd

    fn = entrymod.queries()[name]

    def pairs():
        return sorted(tuple(r) for r in fn(spark, SF).collect())

    hinted = pairs()
    monkeypatch.setattr(dd, "VERIFY_BROADCAST_MAX_DOCS", -1)
    assert pairs() == hinted, f"{name}: gate-OFF changed the result"
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert count_broadcast_exchanges(fn(spark, SF)) == 0, (
            f"{name}: gate OFF but the plan still carries a broadcast hint"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_ivf_cell_scaling_covers_probe_range():
    """Cell count must scale with the corpus through the sf1 probe
    range (50k vectors) — a clamp engaging there would silently turn
    SemDeDup/IVF per-cell work superlinear — and the training-sample
    cap must keep >= 4 sample points per cell at the clamp."""
    from mr_python_spark.similarity import (
        KM_MAX_CELLS,
        KM_SAMPLE_CAP,
        KM_TARGET_CELL,
        ivf_cells,
    )
    from tools import udf_oracles as uo

    assert ivf_cells(50_000) == -(-50_000 // KM_TARGET_CELL)  # unclamped
    assert KM_SAMPLE_CAP >= 4 * KM_MAX_CELLS
    # the oracle mirrors every constant — one edit in two files
    assert (uo.KM_MAX_CELLS, uo.KM_SAMPLE_CAP, uo.KM_TARGET_CELL) == (
        KM_MAX_CELLS,
        KM_SAMPLE_CAP,
        KM_TARGET_CELL,
    )


def test_recall_report_strides_compose():
    """ann_recall_report reuses ann_brute_topk (stride QUERY_STRIDE,
    depth TOP_K) as ground truth for the KM_QUERY_STRIDE query subset
    at depth KM_TOP_K — that composition is only valid while the KM
    subset is a subset of the brute subset and the truth frame is at
    least as deep as the report's k."""
    from mr_python_spark.similarity import (
        KM_QUERY_STRIDE,
        KM_TOP_K,
        QUERY_STRIDE,
        TOP_K,
    )

    assert KM_QUERY_STRIDE % QUERY_STRIDE == 0
    assert KM_TOP_K <= TOP_K


#: every fixture a hash gate runs against (tests at sf0.001, the
#: driver/CHECK default at sf0.01, the full-sweep re-run at sf0.1) —
#: a boundary pair at ANY of them would flip a gate, so the margin
#: pins cover all three, not just the test SF
GATED_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf", GATED_SFS)
def test_semantic_tau_fixture_margin(sf):
    """The engine scores within-cluster cosines with a batch GEMM; the
    numpy udf-oracle uses per-pair dots.  BLAS accumulation order can
    differ in the last ulp, so the hash gate is only stable while no
    within-cluster pair sits exactly on SEM_TAU.  Pin that: every pair
    in every (cell) group must clear the boundary by >= 1e-9."""
    import numpy as np

    from mr_python_spark.dedup import SEM_TAU
    from tools import udf_oracles as uo

    emb, cells = uo.semantic_assignments(sf)
    worst = 1.0
    for c in np.unique(cells):
        M = emb[cells == c]
        if len(M) < 2:
            continue
        iu = np.triu_indices(len(M), k=1)
        gaps = np.abs((M @ M.T)[iu] - SEM_TAU)
        worst = min(worst, float(gaps.min()))
    assert worst >= 1e-9, f"pair within {worst} of SEM_TAU boundary"


@pytest.mark.parametrize("sf", GATED_SFS)
def test_rp_cosine_threshold_margin(sf):
    """dedup_embedding_lsh / dedup_embedding_cosine verify with a
    normalize-then-GEMM float path while the DuckDB oracle uses a
    sequential dot fold over raw doubles; dedup_rp_lsh_eval_report's
    truth side additionally mixes both.  The two paths differ by
    ~1e-15 relative, so threshold membership (cosine >= 0.4) is only
    gate-stable while no pair sits on the boundary.  Pin that: across
    EVERY pair in every gated fixture, both float paths must clear 0.4
    by >= 1e-6 (measured margins: 5.6e-4 / 1.3e-4 / 9.9e-6)."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    iu = np.triu_indices(len(mat), k=1)
    # GEMM path (engine tiers)
    matn = mat / nrm[:, None]
    g_gap = np.abs((matn @ matn.T)[iu] - 0.4).min()
    # dot/(na*nb) path (oracle fold's algebraic form; ulp-close to it)
    f_gap = np.abs(((mat @ mat.T) / np.outer(nrm, nrm))[iu] - 0.4).min()
    assert min(g_gap, f_gap) >= 1e-6, (
        f"pair within {min(g_gap, f_gap)} of the 0.4 cosine threshold"
    )


@pytest.mark.parametrize("sf", GATED_SFS)
def test_bitext_quantization_boundary_margin(sf):
    """bitext_margin_mining quantizes every cross-side cosine ONCE
    (``floor((1+cos)·2^20)``) and is pure integer arithmetic after —
    but the engine's normalize-then-GEMM doubles and the oracle's
    dot/(na·nb) fold differ by ~1e-15 relative, so the gate is only
    stable while no cosine sits on a quantization boundary.  Pin that:
    for EVERY cross-side pair in every gated fixture, the two float
    paths must agree on the floor outright AND sit >= 1e-7 quanta away
    from the nearest boundary (measured minima 9.4e-7 / 1.4e-5 /
    5.9e-6 at sf0.1/0.01/0.001; the cross-engine divergence is ~1e-9
    quanta, so the margin is ~100x)."""
    import duckdb
    import numpy as np

    from mr_python_spark.similarity import (
        BITEXT_SCALE,
        BITEXT_SRC_LANG,
        BITEXT_TGT_LANG,
    )

    rows = duckdb.sql(
        f"""
        SELECT d.lang, e.embedding
        FROM '{sf}/embeddings.parquet' e
        JOIN '{sf}/documents.parquet' d ON e.vec_id = d.doc_id
        WHERE d.lang IN ('{BITEXT_SRC_LANG}', '{BITEXT_TGT_LANG}')
        ORDER BY e.vec_id
        """
    ).fetchall()
    langs = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    x, y = mat[langs == BITEXT_SRC_LANG], mat[langs == BITEXT_TGT_LANG]
    nx, ny = np.linalg.norm(x, axis=1), np.linalg.norm(y, axis=1)
    q_gemm = (1.0 + (x / nx[:, None]) @ (y / ny[:, None]).T) * BITEXT_SCALE
    q_fold = (1.0 + (x @ y.T) / np.outer(nx, ny)) * BITEXT_SCALE
    assert (np.floor(q_gemm) == np.floor(q_fold)).all(), (
        "the two float paths disagree on a quantized cosine"
    )
    worst = min(
        float(np.abs(q_gemm - np.round(q_gemm)).min()),
        float(np.abs(q_fold - np.round(q_fold)).min()),
    )
    assert worst >= 1e-7, f"cosine within {worst} quanta of a floor boundary"
