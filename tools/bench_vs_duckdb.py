"""Side-by-side single-node throughput: this engine vs DuckDB.

The reference publishes no benchmark numbers (BASELINE.md), so the
honest single-node comparison is against the DuckDB oracle running
the SAME query on the SAME parquet — an embedded OLAP engine is a
strong single-node baseline.  Both engines run warm (one untimed
pass, then ``best of N``); Spark executes to a noop sink, DuckDB
fetches to Arrow.

Usage::

    python tools/bench_vs_duckdb.py                 # headline set at sf0.1
    python tools/bench_vs_duckdb.py q1 word_count   # substring-filtered
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main(selected: list[str]) -> int:
    from bench import HEADLINE
    from mr_python_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench-vs-duckdb")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    names = [n for n in HEADLINE if n in oracles]
    if selected:
        names = [n for n in names if any(s in n for s in selected)]

    rows = []
    for name in names:
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm
        spark_best = min(
            _timed(lambda: qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save())
            for _ in range(RUNS)
        )
        sql = oracles[name]
        con.sql(sql).arrow()  # warm
        duck_best = min(_timed(lambda: con.sql(sql).arrow()) for _ in range(RUNS))
        ratio = spark_best / duck_best if duck_best > 0 else float("inf")
        rows.append((name, spark_best, duck_best, ratio))
        print(f"{name:32s} spark {spark_best:7.3f}s  duckdb {duck_best:7.3f}s  ratio {ratio:5.2f}x")

    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb_warm_best_of_3",
                "spark_total_sec": round(total_s, 3),
                "duckdb_total_sec": round(total_d, 3),
                "ratio": round(total_s / total_d, 2) if total_d else None,
                "sf": SF_DIR,
            }
        )
    )
    return 0


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
