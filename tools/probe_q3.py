"""Decompose unbucketed tpch_q3's sf10 residual (VERDICT r5 #3).

Q3 = customer(BUILDING, broadcast) ⨝ orders(date<) ⨝ lineitem(ship>)
on orderkey. The customer dim already broadcast-prunes the ORDERS side
before its orderkey exchange (q5's r4 recipe is structural here); the
open question is the LINEITEM side, which shuffles in full after its
date filter. The candidate fix is Spark's runtime bloom filter
(filtered-orders orderkeys → semi-filter on the lineitem scan), which
is OFF at local scale because lineitem (1 GB) is under the 10 GB
application-side threshold.

Measures, at one sf:
  selectivities of each filter;
  q3 as declared;
  q3 with runtime-bloom thresholds lowered so the filter actually
    builds (plan prints whether BloomFilter/Runtime appears);
  the bare lineitem-side exchange (shuffle floor for the same rows).

Usage: PYTHONPATH=/root/repo python tools/probe_q3.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from database_importer_spark.session import get_spark
from database_importer_spark.plans import REGISTRY
from database_importer_spark.plans.registry import t


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timed(build, runs=6):
    mat(build())
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mat(build())
        ts.append(time.perf_counter() - t0)
    return min(ts), [round(x, 3) for x in ts]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    spark = get_spark("probe-q3")
    spark.sparkContext.setLogLevel("ERROR")

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n_li = li.count()
    n_li_f = li.filter(
        F.col("l_shipdate") > F.lit("1999-03-15").cast("timestamp")
    ).count()
    n_o = o.count()
    n_o_f = o.filter(
        F.col("o_orderdate") < F.lit("1999-03-15").cast("timestamp")
    ).count()
    n_c = c.count()
    n_c_f = c.filter(F.col("c_mktsegment") == "BUILDING").count()
    print(f"lineitem ship> filter: {n_li_f}/{n_li} = {n_li_f/n_li:.3f}")
    print(f"orders   date< filter: {n_o_f}/{n_o} = {n_o_f/n_o:.3f}")
    print(f"customer segment     : {n_c_f}/{n_c} = {n_c_f/n_c:.3f}")

    best, runs = timed(lambda: REGISTRY["tpch_q3_shipping_priority"].fn(spark, sf_dir))
    print(f"q3 declared          {best:7.3f}s  runs={runs}")

    # shuffle floor: just exchange+sort the filtered lineitem side on
    # orderkey (what the SMJ must do no matter how clever the rest is)
    def li_exchange():
        lf = li.filter(
            F.col("l_shipdate") > F.lit("1999-03-15").cast("timestamp")
        ).select("l_orderkey", "l_extendedprice", "l_discount")
        return lf.repartition(32, "l_orderkey").sortWithinPartitions("l_orderkey")

    best, runs = timed(li_exchange)
    print(f"lineitem exchange    {best:7.3f}s  runs={runs}")

    # runtime bloom: let the filtered-orders side build a bloom the
    # lineitem scan applies pre-shuffle
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "64MB",
    )
    df = REGISTRY["tpch_q3_shipping_priority"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_bloom = "bloom" in plan.lower()
    print(f"bloom in plan: {has_bloom}")
    best, runs = timed(lambda: REGISTRY["tpch_q3_shipping_priority"].fn(spark, sf_dir))
    print(f"q3 bloom-tuned       {best:7.3f}s  runs={runs}")
    spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    )
    spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )


if __name__ == "__main__":
    main()
