"""Spark-only min-of-N timing for a key subset — for cross-process
A/Bs of JVM-level settings (e.g. SPARK_DRIVER_MEMORY, which cannot
change inside a live session).

Usage: SPARK_DRIVER_MEMORY=32g PYTHONPATH=/root/repo \
           python tools/probe_heap.py <sf_dir> key [key...]
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
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    runs = 5
    spark = get_spark("probe-heap")
    spark.sparkContext.setLogLevel("ERROR")
    heap = spark.sparkContext.getConf().get("spark.driver.memory")
    print(f"driver.memory={heap}")
    for key in keys:
        q = REGISTRY[key]
        materialize(q.fn(spark, sf_dir))  # warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        print(
            f"{key}: min {min(ts)*1000:.0f} ms  runs {[round(x, 3) for x in ts]}"
        )


if __name__ == "__main__":
    main()
