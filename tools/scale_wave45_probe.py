"""Scaling probe for the round-9 fourth/fifth-wave operators.

Same method and scale points as ``scale_text_probe`` (sf0.1 shipped,
.data/sf1 10x, .data/sf3 30x; warm every scale, then per-query
best-of-3 into the noop sink).  Covers the CCNet terciles (cached-LM
consumer + per-language window), phrase retrieval (in-array, join
free), the near-dup provenance matrix (inherits the df-capped ngram
pair bound), the vocab-growth and shard-balance aggregates, the
trigram-OOV drift join, and the rewritten vocabulary-hashed CMS.

Two caveats recorded here rather than discovered later: (1) the
replicated fixtures multiply every shingle's document frequency, so
the df-capped candidate tier prunes MORE aggressively at sf1/sf3 than
on organic data — the matrix's ratio measures its scan+agg spine, not
pair-explosion behavior (the pair bound is Σ min(df,cap)² by
construction); (2) ccnet's LM frame is cached per (session, corpus),
so its warm number is the marginal join+window cost — the LM's own
scaling is measured separately in scale_probe_text_r9.

Usage::

    python tools/scale_wave45_probe.py

Writes ``docs/scale_probe_wave45_r9.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scale3_probe import SF3_DST, SF3_REPLICAS, _ensure  # noqa: E402
from tools.scale_probe import DST as SF1_DST  # noqa: E402
from tools.scale_probe import SRC  # noqa: E402

QUERIES = [
    "ccnet_perplexity_buckets",
    "search_phrase_topk",
    "dedup_cross_source_matrix",
    "vocab_growth_report",
    "shard_balance_report",
    "incremental_oov_report",
    "cms_heavy_hitters",
]


def main() -> None:
    import __spark_entry__ as entrymod

    from mr_python_spark.session import get_spark

    _ensure(SF1_DST, 10, ("documents",))
    _ensure(SF3_DST, SF3_REPLICAS, ("documents",))

    spark = get_spark("scale_wave45_probe")
    qs = entrymod.queries()
    result: dict = {"replicas_sf3": SF3_REPLICAS, "queries": QUERIES}

    for sf_dir in (SRC, SF1_DST, SF3_DST):
        for name in QUERIES:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", SF1_DST), ("sf3", SF3_DST)):
        timings = {}
        for name in QUERIES:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        timings["total"] = round(sum(timings.values()), 3)
        result[sf_name] = timings

    result["ratio_10x_data"] = {
        k: round(result["sf1"][k] / result["sf0.1"][k], 2)
        for k in result["sf0.1"]
        if result["sf0.1"][k] > 0
    }
    result["ratio_30x_data"] = {
        k: round(result["sf3"][k] / result["sf0.1"][k], 2)
        for k in result["sf0.1"]
        if result["sf0.1"][k] > 0
    }

    out = os.path.join(REPO, "docs", "scale_probe_wave45_r9.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["ratio_30x_data"]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
