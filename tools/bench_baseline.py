"""Measure Spark vs DuckDB wall-clock per headline query at a scale
factor and rewrite the measured-results table in BASELINE.md.

Usage: python tools/bench_baseline.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, RUNS, materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans import REGISTRY  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-baseline")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")

    rows = []
    for key in HEADLINE:
        q = REGISTRY[key]
        materialize(q.fn(spark, sf_dir))  # warm
        stimes = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            stimes.append(time.perf_counter() - t0)
        s_ms = statistics.median(stimes) * 1000

        if q.oracle is not None:
            con.sql(q.oracle).fetchall()  # warm
            dtimes = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.sql(q.oracle).fetchall()
                dtimes.append(time.perf_counter() - t0)
            d_ms = statistics.median(dtimes) * 1000
            ratio = s_ms / d_ms if d_ms else float("inf")
            rows.append((key, s_ms, d_ms, ratio))
        else:
            rows.append((key, s_ms, None, None))

    lines = []
    for key, s_ms, d_ms, ratio in rows:
        if d_ms is None:
            lines.append(f"| `{key}` | {s_ms:.0f} | — | — | rows-only |")
        else:
            ok = "yes" if ratio <= 2 else "no"
            lines.append(
                f"| `{key}` | {s_ms:.0f} | {d_ms:.0f} | {ratio:.1f}x | {ok} |"
            )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
