"""Decompose upsert_merge_full's wall clock at a given sf and A/B the
broadcast-reuse variant (round 4, late): the declared merge builds
THREE broadcast hash relations (update frame ~|src|, src-keys
projection ~|src|, matched-keys ~|src|); projecting the SAME src
frame into the semi probe lets ReuseExchange collapse the first two
into one build.

Usage: PYTHONPATH=/root/repo python tools/probe_upsert.py <sf_dir>
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from database_importer_spark.plans import REGISTRY
from database_importer_spark.plans.part_a import (
    _insert_source_df,
    _updates_df,
)
from database_importer_spark.plans.registry import t
from database_importer_spark.session import get_spark


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, build, runs=5):
    mat(build())  # warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mat(build())
        times.append(time.perf_counter() - t0)
    print(f"{label:42s} {min(times):7.3f}s")
    return min(times)


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("probe_upsert")
    spark.sparkContext.setLogLevel("ERROR")

    def src():
        return (
            _updates_df(spark, sf_dir)
            .unionByName(_insert_source_df(spark, sf_dir))
            .localCheckpoint(eager=False)
        )

    # --- components -------------------------------------------------
    timed("target scan only", lambda: t(spark, sf_dir, "orders"))
    timed("src build+checkpoint", src)

    def update_arm():
        from database_importer_spark.operators.merge import Merger

        m = Merger(t(spark, sf_dir, "orders"), src(), join_on=["o_orderkey"])
        return m.merged(update=True)

    timed("update arm only", update_arm)

    def declared():
        return REGISTRY["upsert_merge_full"].fn(spark, sf_dir)

    timed("declared full merge", declared)

    # --- variant: single shared broadcast for update+semi -----------
    def reuse_variant():
        target = t(spark, sf_dir, "orders")
        s = src()
        u = F.broadcast(s.withColumn("__m", F.lit(True)))
        keys = ["o_orderkey"]
        joined = target.alias("a").join(u.alias("b"), on=keys, how="left")
        cols = []
        for c in target.columns:
            if c in keys:
                cols.append(F.col(c))
            elif c in ("o_totalprice", "o_orderstatus"):
                cols.append(
                    F.when(F.col("__m"), F.col(f"b.{c}"))
                    .otherwise(F.col(f"a.{c}"))
                    .alias(c)
                )
            else:
                cols.append(F.col(f"a.{c}").alias(c))
        out = joined.select(*cols)
        # semi probe against the SAME broadcast subplan (reused build)
        matched_keys = target.select(*keys).join(u, keys, "left_semi")
        unmatched = s.join(F.broadcast(matched_keys), on=keys, how="left_anti")
        pad = unmatched.select(
            *[
                F.col(c).cast(target.schema[c].dataType).alias(c)
                if c in unmatched.columns
                else F.lit(None).cast(target.schema[c].dataType).alias(c)
                for c in target.columns
            ]
        )
        return out.unionByName(pad)

    timed("reuse-broadcast variant", reuse_variant)

    # --- round-5 single-pass full-outer strategy (VERDICT r4 #2) ----
    from database_importer_spark.operators.merge import Merger

    def full_outer():
        m = Merger(t(spark, sf_dir, "orders"), src(), join_on=["o_orderkey"])
        return m.merged(update=True, insert=True, strategy="full_outer")

    timed("full-outer single-pass (unbucketed)", full_outer)

    def declared_bucketed():
        return REGISTRY["upsert_merge_bucketed"].fn(spark, sf_dir)

    timed("declared bucketed merge (two-arm)", declared_bucketed)

    def bucketed_full_outer():
        from database_importer_spark.plans.relational import (
            orderkey_bucketed_facts,
        )

        _, ot = orderkey_bucketed_facts(spark, sf_dir)
        o = spark.table(ot)
        upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
        mx = o.agg((F.max("o_orderkey") + F.lit(1)).alias("__key_base"))
        ins = (
            o.filter(F.col("o_orderkey") % 100 == 0)
            .crossJoin(F.broadcast(mx))
            .select(
                (F.col("o_orderkey") + F.col("__key_base")).alias("o_orderkey"),
                (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
                F.lit("N").alias("o_orderstatus"),
            )
        )
        s2 = upd.unionByName(ins).localCheckpoint(eager=False).hint("merge")
        m = Merger(o, s2, join_on=["o_orderkey"], broadcast=False)
        return m.merged(update=True, insert=True, strategy="full_outer")

    timed("bucketed full-outer single-pass", bucketed_full_outer)

    for label, build in (
        ("full_outer vs declared", (full_outer, declared)),
        ("bucketed_fo vs declared_bucketed", (bucketed_full_outer, declared_bucketed)),
    ):
        x, y = build[0](), build[1]()
        diff = x.exceptAll(y).count() + y.exceptAll(x).count()
        print(f"{label}: exceptAll diff rows = {diff}")
        p = x._jdf.queryExecution().executedPlan().toString()
        print(
            "  plan:", "Exchange" , p.count("Exchange"),
            "| SortMergeJoin", p.count("SortMergeJoin"),
            "| target-side sorts", p.count("Sort ["),
        )

    # sanity: same result as declared (row count + hash proxy)
    a = declared()
    b = reuse_variant()
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("exceptAll diff rows:", diff)

    # how many broadcast exchanges in each executed plan?
    for label, df in (("declared", a), ("reuse", b)):
        p = df._jdf.queryExecution().executedPlan().toString()
        print(
            label,
            "BroadcastExchange:",
            p.count("BroadcastExchange"),
            "ReusedExchange:",
            p.count("ReusedExchange"),
        )


if __name__ == "__main__":
    main()
