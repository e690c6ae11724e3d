"""Decompose udf_pandas_vectorized's sf10 ratio (VERDICT r5 #5): how
much of the Python-boundary cost is (a) pandas conversion, (b) Arrow
serialization itself, (c) the computation floor?

A/B/C the IDENTICAL computation — net price over every lineitem row —
three ways on one session:

  builtin     select(price * (1 - discount))        no Python at all
  mapInArrow  Arrow RecordBatches + pyarrow.compute no pandas, no copy
  pandas_udf  Arrow batches -> pandas Series        the declared key

(b) - (c) = the Arrow boundary; (a) - (b) = the pandas wrapper.

Usage: PYTHONPATH=/root/repo python tools/probe_arrow.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import pandas as pd

from pyspark.sql import functions as F

from database_importer_spark.session import get_spark, static_plan_session
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
    spark = static_plan_session(get_spark("probe-arrow"))
    spark.sparkContext.setLogLevel("ERROR")

    def scan():
        return t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
        )

    def builtin():
        return scan().select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "discounted"
            ),
        )

    def arrow():
        import pyarrow as pa
        import pyarrow.compute as pc

        def net(batches):
            for b in batches:
                out = pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                )
                yield pa.RecordBatch.from_arrays(
                    [b.column("l_orderkey"), b.column("l_linenumber"), out],
                    ["l_orderkey", "l_linenumber", "discounted"],
                )

        return scan().mapInArrow(
            net, "l_orderkey bigint, l_linenumber int, discounted double"
        )

    def pandas_udf():
        @F.pandas_udf("double")
        def discounted(price: pd.Series, discount: pd.Series) -> pd.Series:
            return price * (1.0 - discount)

        return scan().select(
            "l_orderkey",
            "l_linenumber",
            discounted("l_extendedprice", "l_discount").alias("discounted"),
        )

    for name, build in [
        ("builtin   ", builtin),
        ("mapInArrow", arrow),
        ("pandas_udf", pandas_udf),
    ]:
        best, runs = timed(build)
        print(f"{name} {best:7.3f}s  runs={runs}")


if __name__ == "__main__":
    main()
