"""Decompose the checkpointing merge twins' builder constant
(VERDICT r11 item 3): upsert_merge_delta_rows / upsert_merge_bucketed
pay ~450-470 ms of py4j plan construction per invocation that the
frame cache must NOT absorb whole (their localCheckpoint would pin
computed source rows across runs). Time each builder slice separately
so the cacheable share (the PURE pre-checkpoint source) is separated
from the per-invocation share (checkpoint + Merger arm chain).

Usage: python tools/probe_merge_build.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.operators.merge import Merger  # noqa: E402
from database_importer_spark.plans.part_a import (  # noqa: E402
    _insert_source_df,
    _updates_df,
)
from database_importer_spark.plans.registry import REGISTRY, t  # noqa: E402


def timed(label, fn, reps):
    ts = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    print(f"  {min(ts)*1000:7.1f} ms  {label}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-merge-build")
    spark.sparkContext.setLogLevel("ERROR")

    # warm memos (validate/nonempty/footer caches, layouts)
    for key in ("upsert_merge_delta_rows", "upsert_merge_bucketed"):
        REGISTRY[key].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    print("upsert_merge_delta_rows decomposition:")
    target = timed("target t()", lambda: t(spark, sf_dir, "orders"), reps)
    raw = timed(
        "raw source (updates ∪ inserts)",
        lambda: _updates_df(spark, sf_dir).unionByName(
            _insert_source_df(spark, sf_dir)
        ),
        reps,
    )
    src = timed("localCheckpoint(lazy)", lambda: raw.localCheckpoint(eager=False), reps)
    m = timed(
        "Merger ctor",
        lambda: Merger(target, src, join_on=["o_orderkey"], validate_anchor=raw),
        reps,
    )
    timed("merged_delta chain", lambda: m.merged_delta(update=True, insert=True), reps)
    timed(
        "WHOLE builder",
        lambda: REGISTRY["upsert_merge_delta_rows"].fn(spark, sf_dir),
        reps,
    )

    print("upsert_merge_bucketed decomposition:")
    from database_importer_spark.plans.relational import orderkey_bucketed_facts

    _, ot = orderkey_bucketed_facts(spark, sf_dir)
    o = timed("spark.table(layout)", lambda: spark.table(ot), reps)

    def mk_raw():
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
        return upd.unionByName(ins)

    raw_b = timed("raw source (upd ∪ ins)", mk_raw, reps)
    src_b = timed(
        "localCheckpoint(lazy)", lambda: raw_b.localCheckpoint(eager=False), reps
    )
    mb = timed(
        "Merger ctor",
        lambda: Merger(
            o,
            src_b,
            join_on=["o_orderkey"],
            broadcast=False,
            source_join_hint="merge",
            validate_anchor=raw_b,
        ),
        reps,
    )
    timed(
        "merged(full_outer) chain",
        lambda: mb.merged(update=True, insert=True, strategy="full_outer"),
        reps,
    )
    timed(
        "WHOLE builder",
        lambda: REGISTRY["upsert_merge_bucketed"].fn(spark, sf_dir),
        reps,
    )


if __name__ == "__main__":
    main()
