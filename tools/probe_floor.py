"""Decompose the ~200-300 ms per-query scheduling floor on the
sub-second headline band (VERDICT r4 #1).

Hypothesis: for plans with zero or one tiny shuffle, AQE's stage-by-
stage materialization (each shuffle becomes a separately scheduled
job + re-optimization round trip) is a large share of wall clock at
small data, while contributing nothing (the plan has nothing to
re-plan). A/B each floor-bound key against the SAME plan built on a
``spark.newSession()`` whose SQLConf disables adaptive execution —
shared SparkContext/executors, independent conf, no leakage into the
declared session.

Usage: PYTHONPATH=/root/repo python tools/probe_floor.py <sf_dir> [keys...]
"""

from __future__ import annotations

import sys
import time

from database_importer_spark.plans import REGISTRY
from database_importer_spark.session import get_spark

DEFAULT_KEYS = [
    "join_broadcast_hash",
    "limit_topk_global",
    "agg_count_distinct",
    "llm_dedup_exact",
    "tpch_q6_forecast_revenue",
    "agg_hash_groupby",
    "fn_math_core",
    "llm_text_tokenize_tf",
]


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timed(build, runs=6):
    mat(build())
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mat(build())
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    sf_dir = sys.argv[1]
    keys = sys.argv[2:] or DEFAULT_KEYS
    spark = get_spark("probe_floor")
    spark.sparkContext.setLogLevel("ERROR")

    noaqe = spark.newSession()
    noaqe.conf.set("spark.sql.adaptive.enabled", "false")

    noaqe_few = spark.newSession()
    noaqe_few.conf.set("spark.sql.adaptive.enabled", "false")
    noaqe_few.conf.set("spark.sql.shuffle.partitions", "8")

    print(f"{'key':28s} {'aqe_on':>8s} {'aqe_off':>8s} {'off+8part':>9s}")
    for key in keys:
        q = REGISTRY[key]
        on = timed(lambda: q.fn(spark, sf_dir))
        off = timed(lambda: q.fn(noaqe, sf_dir))
        off8 = timed(lambda: q.fn(noaqe_few, sf_dir))
        print(f"{key:28s} {on*1000:7.0f}m {off*1000:7.0f}m {off8*1000:8.0f}m")


if __name__ == "__main__":
    main()
