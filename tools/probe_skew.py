"""Skew-join probe: measured evidence for the two skew strategies the
engine ships — AQE skew-join splitting (config, on by default) and
operators/partitioning.salted_join (explicit, for engines/joins AQE
can't rescue). Results are recorded in BASELINE.md.

Workload: 20M-row fact where ONE key owns 50% of the rows, joined to
a 100k-row dim on that key. Under a plain hash shuffle the hot key's
10M rows land in a single task — the straggler that defines job wall
clock. Three plans, min-of-N wall clock each, noop sink:

  1. plain join, AQE skew handling OFF  (the naive baseline)
  2. plain join, AQE skew handling ON   (runtime partition splitting)
  3. salted_join, AQE OFF               (explicit 16-way salt spread)

Usage: python tools/probe_skew.py [rows] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.operators.partitioning import salted_join  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def build(spark):
    fact = (
        spark.range(ROWS)
        .select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.pmod(F.xxhash64("id"), 100_000))
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
    )
    dim = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return fact, dim


def timed(label, fn):
    best = None
    for _ in range(RUNS):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.1f} s (min of {RUNS})")
    return best


def main():
    spark = get_spark("probe-skew")
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def plain():
        # merge-hint forces the shuffle path (broadcast would dodge
        # the skew instead of confronting it)
        noop(fact.hint("merge").join(dim.hint("merge"), "k").select(F.sum("v")))

    def salted():
        noop(salted_join(fact, dim, ["k"]).select(F.sum("v")))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_naive = timed("plain shuffle join, AQE skew OFF", plain)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    t_aqe = timed("plain shuffle join, AQE skew ON (forced)", plain)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_salt = timed("salted_join (16 buckets), AQE skew OFF", salted)

    print(
        f"\nrows={ROWS:,}; naive={t_naive:.1f}s aqe={t_aqe:.1f}s "
        f"salted={t_salt:.1f}s"
    )


if __name__ == "__main__":
    main()
