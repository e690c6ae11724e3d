"""Same-session A/B: declared single-spark.sql plan form vs the former
DataFrame-chain form, interleaved min-of-N — separates host drift from
a real form regression.

Usage: PYTHONPATH=/root/repo python tools/probe_sqlform.py <sf_dir>
"""

import sys
import time

from pyspark.sql import functions as F

from database_importer_spark.plans import REGISTRY
from database_importer_spark.plans.registry import dec4_sum, t
from database_importer_spark.session import get_spark, static_plan_session


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def q3_bucketed_df_form(spark, sf_dir):
    from database_importer_spark.plans.relational import orderkey_bucketed_facts

    spark = static_plan_session(spark)
    lt, ot = orderkey_bucketed_facts(spark, sf_dir)
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.table(ot).filter(
        F.col("o_orderdate") < F.lit("1999-03-15").cast("timestamp")
    )
    l = spark.table(lt).filter(
        F.col("l_shipdate") > F.lit("1999-03-15").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .hint("merge")
        .join(l.hint("merge"), l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            (
                dec4_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def bhj_df_form(spark, sf_dir):
    """join_broadcast_hash's former DataFrame-chain form (pre-r7)."""
    spark = static_plan_session(spark)
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec4_sum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
    )


def main():
    sf_dir = sys.argv[1]
    runs = 7
    spark = get_spark("probe-sqlform")
    spark.sparkContext.setLogLevel("ERROR")

    forms = {
        "q3b_sql": lambda: REGISTRY["tpch_q3_bucketed"].fn(spark, sf_dir),
        "q3b_df": lambda: q3_bucketed_df_form(spark, sf_dir),
        "bhj_sql": lambda: REGISTRY["join_broadcast_hash"].fn(spark, sf_dir),
        "bhj_df": lambda: bhj_df_form(spark, sf_dir),
    }
    # warm both (layouts, views, codegen)
    for fn in forms.values():
        mat(fn())
    times = {k: [] for k in forms}
    for _ in range(runs):
        for k, fn in forms.items():
            t0 = time.perf_counter()
            mat(fn())
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k}: min {min(ts)*1000:.0f} ms  runs {[round(x,3) for x in ts]}")


if __name__ == "__main__":
    main()
