"""Scaling probe for the round-9 text/model-scoring operators.

The seven round-9 additions are all single-corpus-scan designs (the
trained-model ops ship bounded broadcast models; winnowing is a pure
projection; the dedup matcher is df-cap bounded), so their wall clock
should track data volume sublinearly the way the established linear
families do.  This measures them on the same three points the dedup/ANN
probe uses — sf0.1 (shipped), .data/sf1 (10×), .data/sf3 (30×) — with
the same method (warm every scale first, then per-query best-of-3 into
a noop sink).

Usage::

    python tools/scale_text_probe.py

Writes ``docs/scale_probe_text_r9.json``.
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
    "bigram_lm_perplexity",
    "nb_quality_classifier",
    "dup_ngram_char_fraction",
    "source_drift_report",
    "winnow_fingerprint_report",
    "dedup_winnow",
]


def main() -> None:
    import __spark_entry__ as entrymod

    from mr_python_spark.session import get_spark

    _ensure(SF1_DST, 10, ("documents",))
    _ensure(SF3_DST, SF3_REPLICAS, ("documents",))

    spark = get_spark("scale_text_probe")
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

    out = os.path.join(REPO, "docs", "scale_probe_text_r9.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["ratio_30x_data"]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
