"""Physical-plan audit: assert the plans are the ones we'd want at 100 TB.

For each audited query the formatted plan is checked for the
properties that matter at scale — filters reaching the parquet scan,
pruned read schemas, broadcast joins on dimension tables, map-side
partial aggregation, top-k as TakeOrderedAndProject instead of a
global sort, and no accidental cartesian products anywhere.

Usage::

    python tools/explain_audit.py            # audit all, print report
    python tools/explain_audit.py -v         # include full plans
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: name -> (must-contain regexes, must-NOT-contain regexes)
AUDITS: dict[str, tuple[list[str], list[str]]] = {
    # scan-bound: every predicate pushed, schema pruned to 6 cols, no shuffle
    "filter_project_lineitem": (
        [r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate",
         r"ReadSchema: struct<l_orderkey:bigint,l_linenumber:int",
         r"codegen id"],  # narrow ops fused into whole-stage codegen
        [r"Exchange", r"CartesianProduct"],
    ),
    "q6_forecast_revenue": (
        [r"PushedFilters: \[.*l_shipdate", r"partial_"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    # one wide-table aggregate: partial+final, single exchange
    "q1_pricing_summary": (
        [r"partial_sum", r"HashAggregate"],
        [r"CartesianProduct", r"SortAggregate"],
    ),
    # star joins: dims broadcast, no shuffle join needed for dims
    "q3_shipping_priority": (
        [r"BroadcastHashJoin", r"TakeOrderedAndProject"],
        [r"CartesianProduct"],
    ),
    "q5_local_supplier": ([r"BroadcastHashJoin"], [r"CartesianProduct"]),
    "q10_returned_items": (
        [r"BroadcastHashJoin", r"TakeOrderedAndProject",
         r"PushedFilters: \[.*EqualTo\(l_returnflag,R\)"],
        [r"CartesianProduct", r"Sort\b.*global"],
    ),
    "q4_order_priority": (
        [r"Join type: LeftSemi", r"PushedFilters: \[.*o_orderdate"],
        [r"CartesianProduct"],
    ),
    "q18_large_volume": (
        [r"BroadcastHashJoin", r"partial_sum"],
        [r"CartesianProduct"],
    ),
    # top-k must never be a global sort
    "topk_orders": ([r"TakeOrderedAndProject"], [r"CartesianProduct"]),
    "word_topk": ([r"TakeOrderedAndProject", r"partial_"], []),
    # distinct: expand + two-phase agg, not a naive repartition
    "distinct_users_per_event": ([r"HashAggregate", r"partial_"], []),
    # windows: one shuffle on the partition key, sort within partitions
    "window_top3_per_customer": ([r"RunningWindowFunction|Window"], [r"CartesianProduct"]),
    # dedup joins are equi-joins on hash keys — never nested-loop
    "dedup_ngram_jaccard": (
        [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    "dedup_minhash_lsh": (
        [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    "dedup_exact": ([r"HashAggregate", r"partial_"], [r"Exchange hashpartitioning.*text"]),
    # partitioned layout: the filter prunes directories at the scan
    "partition_pruned_read": (
        [r"PartitionFilters: \[.*event_type", r"partial_"],
        [r"CartesianProduct"],
    ),
    # bucketed layout: co-located scans, NO exchange feeding the join
    "join_bucketed_colocated": (
        [r"Bucketed: true", r"SortMergeJoin"],
        [r"Exchange hashpartitioning\(o_orderkey",
         r"Exchange hashpartitioning\(l_orderkey"],
    ),
    # intentional cross product: broadcast NLJ, never a shuffled CartesianProduct
    "join_cross_product": (
        [r"BroadcastNestedLoopJoin"],
        [r"CartesianProduct"],
    ),
    # moment aggregation combines map-side like any algebraic agg
    "corr_quantity_price": (
        [r"partial_sum", r"HashAggregate"],
        [r"CartesianProduct", r"SortAggregate"],
    ),
    # distribution windows: one shuffle on the partition key
    "window_ntile_distribution": ([r"Window"], [r"CartesianProduct"]),
    # grouped-agg pandas UDAF: the Arrow aggregate node, one exchange
    "pandas_udaf_weighted_avg": (
        [r"ArrowAggregatePython|AggregateInPandas"],
        [r"CartesianProduct"],
    ),
}


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main(argv: list[str]) -> int:
    verbose = "-v" in argv
    names = [a for a in argv if not a.startswith("-")] or sorted(AUDITS)

    from mr_python_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("explain_audit")
    qs = entrymod.queries()
    failures = 0
    for name in names:
        must, must_not = AUDITS[name]
        plan = formatted_plan(qs[name](spark, SF_DIR))
        problems = []
        for pat in must:
            if not re.search(pat, plan):
                problems.append(f"missing /{pat}/")
        for pat in must_not:
            if re.search(pat, plan):
                problems.append(f"forbidden /{pat}/ present")
        status = "ok  " if not problems else "FAIL"
        failures += bool(problems)
        print(f"{status}  {name}" + (f": {'; '.join(problems)}" if problems else ""))
        if verbose or problems:
            print(plan)
    print(f"\n{len(names) - failures}/{len(names)} plans clean")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
