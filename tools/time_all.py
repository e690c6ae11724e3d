"""Time every declared query's Spark side at a scale factor (noop
materialization, single run). Not a benchmark — a LANDMINE DETECTOR:
any query whose wall clock scales super-linearly shows up at the big
sf long before a cluster run would find it.

Usage: python tools/time_all.py [sf_dir] [timeout_s_per_query]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for key in sorted(REGISTRY):
        t0 = time.perf_counter()
        try:
            materialize(REGISTRY[key].fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            rows.append((dt, key, ""))
            print(f"{dt:8.1f}s  {key}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            dt = time.perf_counter() - t0
            rows.append((dt, key, f"ERROR {type(e).__name__}"))
            print(f"{dt:8.1f}s  {key}  ERROR {type(e).__name__}: {e}", flush=True)
    rows.sort(reverse=True)
    print("\nslowest 15:")
    for dt, key, err in rows[:15]:
        print(f"{dt:8.1f}s  {key}  {err}")


if __name__ == "__main__":
    main()
