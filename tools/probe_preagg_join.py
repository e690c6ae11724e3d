"""A/B: aggregate-before-shuffle (guide §2.3) on the two unbucketed
fact⨝fact rows. The lineitem side collapses to per-orderkey partial
sums (long-quantized dec4) BEFORE its exchange, so the join shuffles
and sorts ~15M group rows instead of ~60M line rows; the final
grouping re-sums the partials and walks the identical decimal→double
conversion. Result must be row-identical (verified here, then by the
oracle at 4 sfs).

Usage: python tools/probe_preagg_join.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans import REGISTRY  # noqa: E402
from database_importer_spark.plans.registry import (  # noqa: E402
    DEC,
    sql_view,
    t,
)


def smj_preagg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                + F.lit(0.5)
            )
        ).alias("__rev4"),
    )
    joined = per_order.join(o, per_order.l_orderkey == o.o_orderkey)
    s = F.sum("__rev4")
    return joined.groupBy("o_orderpriority").agg(
        F.sum("__n").alias("n_items"),
        (s.cast("decimal(25,0)") / 10000).cast(DEC).cast("double").alias("revenue"),
    )


def q3_preagg(spark, sf_dir):
    vc = sql_view(spark, sf_dir, "customer")
    vo = sql_view(spark, sf_dir, "orders")
    vl = sql_view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l.l_orderkey,
               CAST(CAST(CAST(SUM(l.__rev4) AS DECIMAL(25,0)) / 10000
                    AS {DEC}) AS DOUBLE) AS revenue,
               o.o_orderdate
        FROM {vc} c
        JOIN {vo} o ON c.c_custkey = o.o_custkey
        JOIN (SELECT l_orderkey,
                     SUM(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                         + 0.5)) AS __rev4
              FROM {vl}
              WHERE l_shipdate > TIMESTAMP '1999-03-15'
              GROUP BY l_orderkey) l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1999-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-preagg")
    spark.sparkContext.setLogLevel("ERROR")
    pairs = {
        "smj": (REGISTRY["join_shuffle_sortmerge"].fn, smj_preagg, ["o_orderpriority"]),
        "q3": (REGISTRY["tpch_q3_shipping_priority"].fn, q3_preagg, None),
    }
    for name, (cur, new, order) in pairs.items():
        a = cur(spark, sf_dir)
        b = new(spark, sf_dir)
        if order:
            a, b = a.orderBy(*order), b.orderBy(*order)
        ra, rb = a.collect(), b.collect()
        print(f"{name}: rows identical: {ra == rb} ({len(ra)} rows)")
        res = {"cur": [], "new": []}
        for r in range(reps):
            for s in ("cur", "new") if r % 2 == 0 else ("new", "cur"):
                fn = cur if s == "cur" else new
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                res[s].append(time.perf_counter() - t0)
        for s, ts in res.items():
            print(f"  {name}.{s}", [round(x, 3) for x in ts], "min", round(min(ts), 3))


if __name__ == "__main__":
    main()
