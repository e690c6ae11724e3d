"""A/B probe: count-distinct plan shapes at a given sf_dir."""

import sys
import time

from pyspark.sql import functions as F

from database_importer_spark.plans.registry import t
from database_importer_spark.session import get_spark


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def tmin(build, n=5):
    mat(build())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        mat(build())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("probe_cd")
    spark.sparkContext.setLogLevel("ERROR")
    o = t(spark, sf_dir, "orders")

    def old_expand():
        return o.groupBy("o_orderpriority").agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    def two_level():
        pre = o.groupBy("o_orderpriority", "o_custkey").agg(
            F.count(F.lit(1)).alias("__n")
        )
        return pre.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("__n").cast("bigint").alias("n_orders"),
        )

    for name, b in (("expand", old_expand), ("two_level", two_level)):
        print(f"{name:12s} {tmin(b):7.3f}s")


if __name__ == "__main__":
    main()
