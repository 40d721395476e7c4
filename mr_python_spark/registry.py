"""Query registry backing the driver contract (``__spark_entry__.py``).

Every capability-layer operator registers a named query callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB
oracle string computing the same result.  Cross-engine determinism
rules (so the driver's order-insensitive value hash matches):

* Sums of money columns go through ``DECIMAL`` so they are exact and
  order-independent, then cast back to ``DOUBLE`` (bit-identical).
* Averages are computed as ``decimal-sum → double ÷ count`` — one IEEE
  division on identical operands.
* Every ``LIMIT``/top-k has a total ordering (unique tiebreaker).
* Integer aggregates are cast to BIGINT on the DuckDB side (its
  ``SUM(int)`` returns HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

#: Registration order IS the driver's grading order: the correctness
#: harness officially records only the first ~50 ``queries()`` entries
#: (CORRECTNESS_r01.json stopped at 50 of 98).  This explicit priority
#: list puts one-or-more representatives of EVERY SURVEY.md §2 category
#: (and every LLM-pipeline family) inside the official window; the
#: remaining registered queries keep their module order after these.
#:
#: Round-8 rotation: 7 long-green entries (a TPC-H composite, the
#: bucketed join, the cohort rep, a string-scalar rep, the plain CSV
#: scan, a quadratic-exact dedup, a quality-filter rep — every removed
#: entry leaves a same-category sibling in-window and stays hash-gated
#: in the full sweep) swapped for the never-driver-graded r6/r7 queries
#: so the DRIVER becomes their auditor of record: the real-decode
#: multimodal path, recursive reach, the ANN recall audit, the Bloom
#: runtime-filter join, permissive corrupt-CSV ingestion, the
#: streaming-join-matrix outer rep, and the new core.py secondary-sort
#: parity gate.  (Round-7 rotation brought in the r5/r6 typed surfaces,
#: Python Data Source stream+sink, behavioral analytics, and newer
#: dedup strategies — those stay.)
#:
#: Round-11 rotation (judge order #4): THIRTEEN entries that had never
#: had a CORRECTNESS_r*.json row in rounds 1–10 (computed from the
#: artifacts) take the slots of thirteen repeatedly-graded entries,
#: oldest graded first, every swap leaving same-category kin in-window
#: and every rotated-out entry hash-gated in the full sweep — see the
#: inline comments below for each pairing.  First-time entries:
#: q13_customer_distribution, join_salted_skew, window_moving_avg,
#: setop_except_all, topk_orders, cube_grouping_id,
#: not_in_subquery_customers, schema_evolution_read,
#: sink_dynamic_partition_overwrite, tokenizer_bakeoff_envelope,
#: dedup_winnow, dedup_lexical_semantic_agreement,
#: pagerank_dedup_graph.
#:
#: Round-12 rotation (judge orders #1–2): EIGHTEEN entries that had
#: never had a CORRECTNESS_r*.json row in rounds 1–11 (recomputed from
#: the artifacts at r12 start: 94-entry pool) take the slots of
#: eighteen repeatedly-graded entries, oldest graded first, every swap
#: leaving same-category kin in-window and every rotated-out entry
#: hash-gated in the full sweep.  Leading the rotation per the judge:
#: the CDC family (scd2_event_intervals, cdc_latest_snapshot,
#: merge_upsert_orders — operators/timeseries.py, the only §2c-adjacent
#: family with zero driver-graded rows ever) and the two seasoned r11
#: operators (doremi_domain_weights, dedup_cluster_survivors).  The
#: swap pairings are inline below; the remaining 76-entry never-graded
#: pool is listed in docs/ROUND_NOTES.md for the r13 runway.
#:
#: Round-10 rotation: the ten round-9 wave-3–6 entries that were green
#: in both full sweeps but never driver-graded take the window slots
#: of ten r9-graded entries, each of which leaves same-category kin
#: in-window and stays hash-gated in the full sweep:
#: search_bm25_topk → search_phrase_topk (retrieval),
#: cms_heavy_hitters → streaming_cms_hitters (CMS sketch, now the
#: live-stream variant), pandas_udf_token_count →
#: tokenizer_fertility_report (Arrow-encode surface; udtf + udaf keep
#: the UDF slots), dsir_importance_weights →
#: mixture_temperature_weights (selection/mixture),
#: event_transition_matrix → incremental_oov_report (funnel stays as
#: the behavioral rep), dedup_containment → shard_balance_report
#: (three dedup reps remain), ann_recall_report →
#: ann_pq_recall_report (recall-audit slot, PQ variant),
#: knn_label_eval → hard_negative_mining (blocked-GEMM eval kin),
#: q6_forecast_revenue → ann_filtered_topk (q1/pipeline_rekey keep
#: the TPC-H composites), join_bloom_runtime_filter →
#: vocab_growth_report (three join shapes remain).
PRIORITY: list[str] = [
    # §2a parity gates — permanent window anchors
    "parity_word_count",
    "parity_secondary_sort",
    # --- Round-14 note: CORRECTNESS_r13.json was never delivered, so
    # the 18 round-13 first-timers were never officially graded — they
    # KEEP their slots for the r14 grading (one exception:
    # dedup_embedding_lsh carries only a udf-tier oracle, so the driver
    # would record it rows-only; it rotates back to the sweep/udf tier
    # and a hash-gateable dedup rep takes the slot).  Beyond those,
    # TWENTY-THREE entries never graded in r01–r12 replace
    # repeatedly-graded ones, every swap leaving same-category kin
    # in-window and every rotated-out entry hash-gated in the full
    # sweep (r12-graded unless noted): q13/q1_decimal → q15/q17
    # (TPC-H), salted-skew + null-aware NOT IN → right-outer +
    # shuffle-hash-hint (joins), moving-avg → top3-per-customer
    # (windows), EXCEPT ALL → EXCEPT distinct (setops), variant →
    # date-arith (scalar/typed row), distinct-users →
    # approx-distinct envelope (distinct row), schema-evolution +
    # dynamic-overwrite → streaming parquet sink (sources keep the
    # pyds pair; sinks keep the streaming sink), stateful-sessions +
    # join-outer-live → sessions-tws + join-semi-live (streaming),
    # bakeoff-envelope + pandas-udaf → grouped-map-sharded +
    # arrow-python-udf (UDF surface), winnow + lexical-semantic
    # agreement → winnow_fingerprint_report + text_normalize (dedup
    # keeps 3 reps; text analysis gains), decode_real →
    # multimodal_probe_arrow (multimodal), hard-negative →
    # bigram_lm_perplexity (LM; GEMM eval keeps ann_filtered + the
    # sweep), bitext + ablation + pagerank →
    # split_train_val_test + decontaminate_against_eval +
    # encode_tokens_to_ids + shuffle_shard_order (pipeline passes).
    # TPC-H composites
    "q1_pricing_summary",
    "q8_market_share",
    "q12_priority_shipping",
    "q15_top_supplier",
    "q17_small_quantity",
    "pipeline_rekey_bands",
    "ann_filtered_topk",
    # join shapes
    "join_cross_product",
    "join_asof_forward",
    "join_right_outer",
    "join_shuffle_hash_hint",
    # window functions
    "window_ntile_distribution",
    "window_lag_delta",
    "window_top3_per_customer",
    # streaming (CDC apply + incremental MV from r13; tws sessions,
    # semi join, parquet sink first-graded r14)
    "streaming_cdc_apply",
    "streaming_incremental_mv",
    "streaming_sessions_tws",
    "streaming_join_semi_live",
    "streaming_parquet_sink",
    # set ops
    "setop_intersect_all",
    "setop_except",
    # sorts / limits
    "topk_orders",
    # grouping sets
    "cube_grouping_id",
    # scalar function families + typed surfaces
    "date_arith_orders",
    # statistics + distinct + accuracy envelopes
    "corr_quantity_price",
    "histogram_prices",
    "approx_quantile_envelope",
    "agg_minmax_by",
    "approx_distinct_envelope",
    # projection/filter
    "filter_project_lineitem",
    # sources + sinks
    "pyds_calendar_scan",
    "pyds_sink_roundtrip",
    # UDF / UDTF / UDAF surface
    "arrow_grouped_map_langstats",
    "grouped_map_top2_sharded",
    "arrow_python_udf",
    # LLM-pipeline families
    "unimax_language_budgets",
    "dedup_cross_source_matrix",
    "dedup_incremental_prefix",
    "winnow_fingerprint_report",
    "pii_scrub_canaries",
    "text_normalize",
    "bigram_lm_perplexity",
    "split_train_val_test",
    "decontaminate_against_eval",
    "encode_tokens_to_ids",
    "shuffle_shard_order",
    "multimodal_probe_arrow",
    "pipeline_curate_report",  # capstone composed pipeline (round-5)
]


def register(name: str, oracle: str | None = None):
    """Decorator: register a query, optionally with its DuckDB oracle."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every module that registers queries, then apply PRIORITY order."""
    from mr_python_spark import dedup, multimodal, similarity, sources, streaming  # noqa: F401
    from mr_python_spark.sources import pyds  # noqa: F401
    from mr_python_spark.streaming import stateful  # noqa: F401
    from mr_python_spark.functions import (  # noqa: F401
        bpe,
        lm,
        pipeline,
        pyudf,
        scalars,
        text,
        unigram,
        vectors,
    )
    from mr_python_spark.operators import (  # noqa: F401
        aggregates,
        bucketing,
        graph,
        joins,
        parity,
        setops,
        sorting,
        stats,
        timeseries,
        tpch,
        tpch_advanced,
        typed,
        windows,
    )

    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        # not an assert: -O would strip it and a typo'd PRIORITY name
        # would silently drop out of the graded window
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    ordered = PRIORITY + [n for n in QUERIES if n not in PRIORITY]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in ordered if n in snapshot})
