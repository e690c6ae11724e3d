"""Decompose the sf10 at-gate keys (2.1-2.2x) into per-call
PLANNING time vs pure EXECUTION time.

The bench protocol (tools/bench_baseline.py) re-invokes the plan
builder every run, so its wall = builder + analysis/optimization +
execution. If a large share is plan-side constant (catalog
resolution, layout-memo, join analysis), that's attackable without
touching the physical plan; if it's execution, the row is at the
engine floor.

Method per key, min-of-N in ONE session:
  * build:   q.fn(spark, sf_dir)  (DataFrame construction only)
  * plan:    df._jdf.queryExecution().executedPlan()  (forces
             analysis + optimization + physical planning, no jobs)
  * exec:    materialize(df) on a PRE-BUILT df (jobs only)
  * total:   build + materialize fresh each time (bench protocol)

Usage: python tools/probe_atgate.py [sf_dir] [keys...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans import REGISTRY  # noqa: E402

DEFAULT_KEYS = [
    "tpch_q5_bucketed",
    "tpch_q3_bucketed",
    "win_rank_topk_per_group",
    "agg_hash_groupby_double",
]

RUNS = 6


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    keys = sys.argv[2:] or DEFAULT_KEYS
    spark = get_spark("probe-atgate")
    spark.sparkContext.setLogLevel("ERROR")

    for key in keys:
        q = REGISTRY[key]
        materialize(q.fn(spark, sf_dir))  # warm layouts / caches / JIT

        def best(fn):
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn()
                times.append(time.perf_counter() - t0)
            return min(times) * 1000, times

        b_ms, _ = best(lambda: q.fn(spark, sf_dir))
        df = q.fn(spark, sf_dir)
        p_ms, _ = best(lambda: q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan())
        e_ms, _ = best(lambda: materialize(df))
        t_ms, traw = best(lambda: materialize(q.fn(spark, sf_dir)))
        print(
            f"{key}: build {b_ms:.0f} ms | build+plan {p_ms:.0f} ms | "
            f"exec-only {e_ms:.0f} ms | total {t_ms:.0f} ms "
            f"(runs {[round(x, 3) for x in traw]})"
        )


if __name__ == "__main__":
    main()
