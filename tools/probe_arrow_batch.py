"""A/B Arrow batch sizing for the pandas-UDF key (VERDICT r11 item 6,
guide §4): r5 measured 64k rows/batch best for the then-shape; the
r11 frame cache changed the constant mix, so re-measure. Each batch
size runs on its own child session (AQE off, matching the declared
key's static_plan_session) over the same two-input-column pandas_udf
plan; alternated reps, min-of-N, noop sink.

Note: spark.sql.execution.arrow.pyspark.selfDestruct.enabled only
affects toPandas() driver collects — the UDF executor path never
reads it, so it is out of scope here (documented, not A/B'd).

Usage: python tools/probe_arrow_batch.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from bench import materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans.registry import t  # noqa: E402

SIZES = [16384, 32768, 65536, 131072, 262144]


def build(child, sf_dir):
    @F.pandas_udf("double")
    def discounted(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = t(child, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("probe-arrow-batch")
    spark.sparkContext.setLogLevel("ERROR")
    frames = {}
    for n in SIZES:
        child = spark.newSession()
        child.conf.set("spark.sql.adaptive.enabled", "false")
        child.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(n))
        frames[n] = build(child, sf_dir)
        materialize(frames[n])  # warm
    res: dict[int, list[float]] = {n: [] for n in SIZES}
    for r in range(reps):
        order = SIZES if r % 2 == 0 else list(reversed(SIZES))
        for n in order:
            t0 = time.perf_counter()
            materialize(frames[n])
            res[n].append(time.perf_counter() - t0)
    for n in SIZES:
        ts = res[n]
        print(
            f"{n:7d} rows/batch  min {min(ts):.3f}  "
            f"runs {[round(x, 3) for x in ts]}"
        )


if __name__ == "__main__":
    main()
