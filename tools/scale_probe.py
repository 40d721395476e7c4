"""Cross-SF scaling probe: synthesize sf1 facts and time queries vs sf0.1.

The driver ships sf{0.001,0.01,0.1} only.  To check the claim that a
10× data decade costs well under 10× wall-clock (fixed overhead and
parallel slack dominate at small SF), this tool builds a synthetic sf1
under ``<repo>/.data/sf1`` — fact tables (lineitem, orders) replicated
10× with non-overlapping order keys, dimension tables copied — and
times a TPC-H-shaped query set at both scale factors in one session.

The synthetic sf1 is an internal scaling experiment, NOT a correctness
input: oracle-gated runs always use the driver's own parquet.

Usage::

    python tools/scale_probe.py           # generate (once) + measure
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".data", "sf1")

#: fact tables replicated 10x with offset order keys; dims copied as-is
REPLICAS = 10
QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q18_large_volume",
    "join_left_outer_agg",
]


def generate() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    offset = con.sql(
        f"SELECT MAX(o_orderkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT o_orderkey + i * {offset} AS o_orderkey,
                 o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                 o_orderpriority
          FROM '{SRC}/orders.parquet' CROSS JOIN range({REPLICAS}) t(i)
        ) TO '{DST}/orders.parquet' (FORMAT parquet)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT l_orderkey + i * {offset} AS l_orderkey,
                 l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet' CROSS JOIN range({REPLICAS}) t(i)
        ) TO '{DST}/lineitem.parquet' (FORMAT parquet)
        """
    )
    for dim in ("region", "nation", "customer", "supplier", "part"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{DST}/{dim}.parquet' (FORMAT parquet)"
        )


def run() -> None:
    if not os.path.exists(os.path.join(DST, "lineitem.parquet")):
        generate()

    from mr_python_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("scale_probe")
    qs = entrymod.queries()

    # warm: run the set once at sf0.1 (codegen, readers, shuffle paths)
    for name in QUERIES:
        qs[name](spark, SRC).write.format("noop").mode("overwrite").save()

    result: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        timings = {}
        for name in QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        timings["total"] = round(sum(timings.values()), 3)
        result[sf_name] = timings
    result["ratio_10x_data"] = {
        k: round(result["sf1"][k] / result["sf0.1"][k], 2)
        for k in result["sf0.1"]
        if result["sf0.1"][k] > 0
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    run()
