"""Decompose llm_dedup_exact at scale (VERDICT r4 #4): is the ~0.6 s
sf10 cost a shuffle defect or the irreducible scan+hash floor?

The declared plan already has the "two-level digest pre-agg": Spark's
HashAggregate(partial) collapses duplicate digests per input split
BEFORE the exchange, so only distinct (digest, min-id, partial-count)
rows move — verified here by plan inspection. What remains is
(a) reading ~750 MB of text pages and (b) two xxhash64 passes per
row. This probe times each layer:

  scan-only          parquet text scan, no hash, no agg
  scan+hash          + both xxhash64s (map-only, no shuffle)
  declared           full query (hash + partial agg + 16-byte
                     exchange + final agg)

If declared − scan+hash is small, the exchange/agg is already ~free
and the 0.6 s is floor (the text is read once and hashed once — the
minimum any engine must do).

Usage: PYTHONPATH=/root/repo python tools/probe_dedup_exact.py <sf_dir>
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from database_importer_spark.plans import REGISTRY
from database_importer_spark.plans.registry import t
from database_importer_spark.session import get_spark


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, build, runs=5):
    mat(build())
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mat(build())
        times.append(time.perf_counter() - t0)
    print(f"{label:30s} {min(times):7.3f}s")


def corpus(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return d.unionByName(planted)


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("probe_dedup")
    spark.sparkContext.setLogLevel("ERROR")

    timed("scan-only", lambda: corpus(spark, sf_dir).select(F.length("text")))
    timed(
        "scan+hash (map-only)",
        lambda: corpus(spark, sf_dir).select(
            "doc_id",
            F.xxhash64(F.col("text")).alias("h1"),
            F.xxhash64(F.lit(1), F.col("text")).alias("h2"),
        ),
    )
    timed("declared", lambda: REGISTRY["llm_dedup_exact"].fn(spark, sf_dir))

    plan = (
        REGISTRY["llm_dedup_exact"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_partial = plan.count("HashAggregate")
    print(
        "plan: HashAggregate nodes:", n_partial,
        "(2 = partial+final: the pre-shuffle collapse already exists)",
    )


if __name__ == "__main__":
    main()
