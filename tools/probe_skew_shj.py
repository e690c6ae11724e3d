"""A/B the skew demo's join strategy: sort-merge (current) vs
shuffled-hash (guide §3.1 — no sort, build the per-partition dim
slice) under the SAME skew-split session. AQE's OptimizeSkewedJoin
handles both SMJ and SHJ, so the demo's contract (skew=true fires,
no broadcast) survives either way; the question is wall clock.

Usage: python tools/probe_skew_shj.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans.registry import DEC, t  # noqa: E402
from database_importer_spark.session import (  # noqa: E402
    parse_byte_conf,
    skew_plan_session,
)


def build(spark, sf_dir, strategy):
    li_path = os.path.join(sf_dir, "lineitem.parquet")
    li_bytes = (
        sum(
            os.path.getsize(os.path.join(li_path, n))
            for n in os.listdir(li_path)
        )
        if os.path.isdir(li_path)
        else os.path.getsize(li_path)
    )
    target = max(512 * 1024, li_bytes // 64)
    for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ):
        spark.conf.set(k, str(target))
    li = t(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 5 != 0, F.lit(0).cast("bigint"))
        .otherwise(F.col("l_orderkey"))
        .alias("hot"),
        "l_extendedprice",
        "l_returnflag",
    )
    max_pb = parse_byte_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes")
    )
    if li_bytes // max_pb < 8:
        fact = fact.repartition(spark.sparkContext.defaultParallelism)
    o = t(spark, sf_dir, "orders")
    dim = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("hot"),
            (F.col("o_orderkey") % 7 + 1).cast("double").alias("w"),
        )
        .unionAll(
            spark.range(1).select(
                F.lit(0).cast("bigint").alias("hot"),
                F.lit(1.0).alias("w"),
            )
        )
    )
    if strategy == "shj":
        dim = dim.hint("shuffle_hash")
    return (
        fact.join(dim, "hot")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum((F.col("l_extendedprice") * F.col("w")).cast(DEC))
            .cast("double")
            .alias("weighted_sum"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-skew-shj")
    spark.sparkContext.setLogLevel("ERROR")
    spark = skew_plan_session(spark)
    res: dict[str, list[float]] = {"smj": [], "shj": []}
    # verify identical results once
    a = build(spark, sf_dir, "smj").orderBy("l_returnflag").collect()
    b = build(spark, sf_dir, "shj").orderBy("l_returnflag").collect()
    print("rows identical:", a == b, a)
    # check skew=true fires under BOTH strategies (final adaptive plan)
    import re

    for s in ("smj", "shj"):
        df = build(spark, sf_dir, s)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        joins = re.findall(r"[^\n]*(?:ShuffledHashJoin|SortMergeJoin)[^\n]*", plan)
        reads = re.findall(r"[^\n]*AQEShuffleRead[^\n]*", plan)
        print(f"{s} joins:", [j.strip()[:90] for j in joins[:2]])
        print(f"{s} reads:", [r.strip()[:60] for r in reads[:4]])
    for r in range(reps):
        for s in ("smj", "shj") if r % 2 == 0 else ("shj", "smj"):
            t0 = time.perf_counter()
            materialize(build(spark, sf_dir, s))
            res[s].append(time.perf_counter() - t0)
    for s, ts in res.items():
        print(s, [round(x, 3) for x in ts], "min", round(min(ts), 3))


if __name__ == "__main__":
    main()
