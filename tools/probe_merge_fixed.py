"""A/B the fixed per-invocation jobs of upsert_merge_full (VERDICT r6
item 3): the validate_unique_keys agg job and the source
localCheckpoint. Monkeypatch each off and time the declared plans.

Usage: PYTHONPATH=/root/repo python tools/probe_merge_fixed.py [sf_dir]
"""

import sys
import time

from database_importer_spark.operators import merge as merge_mod
from database_importer_spark.plans import REGISTRY
from database_importer_spark.session import get_spark


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, build, n=5):
    mat(build())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        mat(build())
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} min {min(ts):7.3f}s  (runs: {', '.join(f'{x:.3f}' for x in ts)})")
    return min(ts)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".bench/sf10"
    spark = get_spark("probe_merge_fixed")
    spark.sparkContext.setLogLevel("ERROR")

    # Patch the CLASSIC DataFrame: pyspark 4 instances are
    # pyspark.sql.classic.dataframe.DataFrame, which overrides
    # localCheckpoint — patching the base class is a silent no-op.
    import pyspark.sql.classic.dataframe as df_mod

    real_validate = merge_mod.Merger.validate_unique_keys
    real_ckpt = df_mod.DataFrame.localCheckpoint

    for key in ("upsert_merge_full", "upsert_merge_delta_rows"):
        fn = REGISTRY[key].fn
        print(f"== {key} ==")
        timeit("baseline (validate + ckpt)", lambda: fn(spark, sf_dir))
        merge_mod.Merger.validate_unique_keys = lambda self: None
        timeit("no validate", lambda: fn(spark, sf_dir))
        df_mod.DataFrame.localCheckpoint = lambda self, eager=True: self
        timeit("no validate, no ckpt", lambda: fn(spark, sf_dir))
        merge_mod.Merger.validate_unique_keys = real_validate
        timeit("validate, no ckpt", lambda: fn(spark, sf_dir))
        df_mod.DataFrame.localCheckpoint = real_ckpt

    # Residual decomposition for upsert_merge_full (r7): how much of
    # the steady-state time is irreducible row re-emission vs the
    # merge's extra arms. "1 bcast probe" is the MINIMAL full-table
    # update shape: stream every target row through one broadcast
    # hash probe and re-emit all 15.15M rows — no insert arm, no
    # union, no batch build beyond the one relation.
    from pyspark.sql import functions as F

    from database_importer_spark.plans.part_a import _updates_df
    from database_importer_spark.plans.registry import t

    print("== upsert_merge_full residual decomposition ==")
    o = t(spark, sf_dir, "orders")
    timeit("target scan -> noop", lambda: o)
    u = _updates_df(spark, sf_dir)
    timeit("+ 1 bcast probe, re-emit all rows", lambda: o.join(
        F.broadcast(
            u.withColumnRenamed("o_totalprice", "nt")
            .withColumnRenamed("o_orderstatus", "ns")
        ),
        "o_orderkey",
        "left",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.coalesce("ns", "o_orderstatus").alias("o_orderstatus"),
        F.coalesce("nt", "o_totalprice").alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    ))
    timeit("declared upsert_merge_full", lambda: REGISTRY[
        "upsert_merge_full"].fn(spark, sf_dir))


if __name__ == "__main__":
    main()
