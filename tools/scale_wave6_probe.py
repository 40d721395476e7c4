"""Scaling probe for the round-9 sixth-wave operators.

Same method and scale points as ``scale_wave45_probe`` (sf0.1 shipped,
.data/sf1 10x, .data/sf3 30x; warm every scale, then per-query
best-of-3 into the noop sink).  Covers the cross-sides bitext grid and
the ablation curve's distributed decile rank.

Fixture note: replicated embeddings are per-replica ISOMETRIC
rotations (scale_probe.py), so each replica's cross-lingual neighbor
structure matches the original while cross-replica cosines
decorrelate — the mining cost envelope (grid GEMM FLOPs ~ |X|·|Y|·d)
is what scales, which is exactly what this probe measures; a hidden
all-pairs driver-side path would blow up ~replicas² instead of the
grid's communication-bound growth.  The ablation curve's LM frame is
cached per (session, corpus), so its warm number is the marginal
rank+join cost (the LM's own scaling: scale_probe_text_r9).

Usage::

    python tools/scale_wave6_probe.py

Writes ``docs/scale_probe_wave6_r9.json``.
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
    "bitext_margin_mining",
    "quality_ablation_curve",
]


def main() -> None:
    import __spark_entry__ as entrymod

    from mr_python_spark.session import get_spark

    _ensure(SF1_DST, 10, ("documents", "embeddings"))
    _ensure(SF3_DST, SF3_REPLICAS, ("documents", "embeddings"))

    spark = get_spark("scale_wave6_probe")
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
    }
    result["ratio_30x_data"] = {
        k: round(result["sf3"][k] / result["sf0.1"][k], 2)
        for k in result["sf0.1"]
    }
    out = os.path.join(REPO, "docs", "scale_probe_wave6_r9.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["ratio_10x_data"]))
    print(json.dumps(result["ratio_30x_data"]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
