"""Floor decomposition for the r6-verdict 2-3x band at sf10:
agg_hash_groupby / agg_hash_groupby_double / win_rank_topk_per_group /
win_running_sum_rows. Each variant strips one cost layer so the
residual-vs-DuckDB ratio can be attributed (scan, predicate, hash-agg
engine, exchange+sort, window function, output-row cast chain).

Usage: PYTHONPATH=/root/repo python tools/probe_band.py [sf_dir]
Protocol: warm once, min-of-5, noop sink (same as bench_baseline).
"""

import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database_importer_spark.plans.registry import sql_view, t
from database_importer_spark.session import get_spark, static_plan_session


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, build):
    mat(build())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        mat(build())
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} min {min(ts):7.3f}s  (runs: {', '.join(f'{x:.3f}' for x in ts)})")
    return min(ts)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf10"
    spark = get_spark("probe_band")
    spark.sparkContext.setLogLevel("ERROR")
    sp = static_plan_session(spark)
    v = sql_view(sp, sf_dir, "lineitem")

    print("== agg_hash_groupby_double decomposition (lineitem) ==")
    timeit("scan6 count(*) no filter", lambda: sp.sql(
        f"SELECT COUNT(*) FROM (SELECT l_returnflag, l_linestatus, l_quantity,"
        f" l_extendedprice, l_discount, l_shipdate FROM {v})"))
    timeit("+ filter, count only", lambda: sp.sql(
        f"SELECT COUNT(*) FROM {v} WHERE l_shipdate <= TIMESTAMP '2001-09-02'"))
    timeit("+ groupby2str count only", lambda: sp.sql(
        f"SELECT l_returnflag, l_linestatus, COUNT(*) FROM {v} "
        f"WHERE l_shipdate <= TIMESTAMP '2001-09-02' "
        f"GROUP BY l_returnflag, l_linestatus"))
    timeit("+ 3 plain double sums", lambda: sp.sql(
        f"SELECT l_returnflag, l_linestatus, SUM(l_quantity), "
        f"SUM(l_extendedprice), SUM(l_extendedprice*(1-l_discount)), COUNT(*) "
        f"FROM {v} WHERE l_shipdate <= TIMESTAMP '2001-09-02' "
        f"GROUP BY l_returnflag, l_linestatus"))
    timeit("full (cents-floor quantized)", lambda: sp.sql(
        f"SELECT l_returnflag, l_linestatus, "
        f"SUM(FLOOR(l_quantity*100+0.5))/100, "
        f"SUM(FLOOR(l_extendedprice*100+0.5))/100, "
        f"SUM(FLOOR(l_extendedprice*(1-l_discount)*100+0.5))/100, "
        f"SUM(FLOOR(l_quantity*100+0.5))/100/COUNT(*), COUNT(*) "
        f"FROM {v} WHERE l_shipdate <= TIMESTAMP '2001-09-02' "
        f"GROUP BY l_returnflag, l_linestatus"))

    print("== win_running_sum_rows decomposition (orders) ==")
    o = t(sp, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    timeit("scan4 noop", lambda: o)
    timeit("+ exchange(custkey)", lambda: o.repartition(32, "o_custkey"))
    timeit("+ sortWithinPartitions", lambda: o.repartition(32, "o_custkey")
           .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey"))
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    timeit("+ window long-sum only", lambda: o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))).over(w)
        .alias("s")))
    timeit("+ double division (no decimal)", lambda: o.select(
        "o_custkey", "o_orderkey",
        (F.sum(F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))).over(w)
         / F.lit(10000.0)).alias("s")))
    timeit("full (decimal cast chain/row)", lambda: o.select(
        "o_custkey", "o_orderkey",
        (F.sum(F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5))).over(w)
         .cast("decimal(25,0)") / 10000).cast("decimal(25,4)").cast("double")
        .alias("s")))

    print("== win_rank_topk_per_group decomposition (orders) ==")
    ov = sql_view(sp, sf_dir, "orders")
    timeit("scan3 noop", lambda: sp.sql(
        f"SELECT o_custkey, o_orderkey, o_totalprice FROM {ov}"))
    timeit("full rank topk", lambda: sp.sql(f"""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM {ov}
        ) WHERE rn <= 3"""))


if __name__ == "__main__":
    main()
