"""A/B the three CDF diff shapes behind table_changes_merge
(BASELINE r8 third session): given the cdc table's v0→v1 manifests,
time (a) the 2×exceptAll + 4-join shape, (b) the full-row groupBy-net
shape, (c) the shipped digest-net + AQE-broadcast fetch shape — all
three land within noise at sf10 (~2.2-2.9 s) because the floor is two
scans of the touched slice plus ONE diff shuffle, not the join
topology. The digest form ships because its shuffle carries ~24 B/row
(xxhash64, key, ±1) instead of full rows — irrelevant on a
memory-speed local shuffle, decisive on a network one.

Usage: PYTHONPATH=/root/repo python tools/probe_cdf.py [sf_dir]
(the cdc table must exist — run the table_changes_merge key once
first, e.g. via tools/check_oracles.py <sf_dir> table_changes_merge).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_importer_spark import get_spark
from database_importer_spark.operators import snapshot_table as st
from database_importer_spark.plans.part_a import _snap_loc

RUNS = 5


def timed(tag, df):
    times = []
    for _ in range(RUNS + 1):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    times = times[1:]  # drop warm-up
    print(f"  {tag:28s} min {min(times):.3f}s  runs {[round(x, 3) for x in times]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    spark = get_spark("probe-cdf")
    spark.sparkContext.setLogLevel("ERROR")
    loc = _snap_loc(spark, sf_dir, "cdc")
    m0, m1 = st.load_manifest(loc, 0), st.load_manifest(loc, 1)
    p0 = {e["path"] for e in m0["files"]}
    p1 = {e["path"] for e in m1["files"]}
    removed = [e for e in m0["files"] if e["path"] not in p1]
    added = [e for e in m1["files"] if e["path"] not in p0]
    schema = T.StructType.fromJson(m0["schema"])
    old = spark.read.schema(schema).parquet(
        *[os.path.join(loc, e["path"]) for e in removed]
    )
    new = spark.read.schema(schema).parquet(
        *[os.path.join(loc, e["path"]) for e in added]
    )
    print(
        f"slice: removed {sum(e['rows'] for e in removed)} rows / "
        f"added {sum(e['rows'] for e in added)} rows"
    )
    cols = schema.names
    out_cols = [F.col(c) for c in cols]
    key = ["o_orderkey"]

    timed("scan old+new (floor)", old.unionAll(new))

    # (a) 2×exceptAll + 4-join (the r8 first cut)
    gone = old.exceptAll(new)
    fresh = new.exceptAll(old)
    upd = fresh.select(*key).intersect(gone.select(*key))
    tag_ = lambda df, t: df.select(F.lit(t).alias("_ct"), *out_cols)  # noqa: E731
    a = (
        tag_(fresh.join(upd, key, "left_anti"), "insert")
        .unionAll(tag_(fresh.join(upd, key, "left_semi"), "update_postimage"))
        .unionAll(tag_(gone.join(upd, key, "left_semi"), "update_preimage"))
        .unionAll(tag_(gone.join(upd, key, "left_anti"), "delete"))
    )
    timed("(a) exceptAll + 4 joins", a)

    # (b) full-row groupBy-net (wide string group keys)
    sided = old.withColumn("_side", F.lit(-1)).unionAll(
        new.withColumn("_side", F.lit(1))
    )
    b = (
        sided.groupBy(*cols)
        .agg(F.sum("_side").alias("_net"))
        .filter(F.col("_net") != 0)
    )
    timed("(b) full-row groupBy net", b)

    # (c) the shipped digest shape (production path, incl. window)
    c = st.read_changes(spark, loc, 0, 1, key)
    timed("(c) digest net + fetch (ship)", c)


if __name__ == "__main__":
    main()
