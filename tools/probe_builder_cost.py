"""Decompose each headline key into BUILDER time (py4j plan
construction: fn(spark, sf_dir) with no action) vs EXECUTION time
(noop materialization of a prebuilt frame). The builder share is the
per-invocation constant a frame_cache removes; the execution share is
the real engine work. Guide §1: measure before changing.

Usage: python tools/probe_builder_cost.py [sf_dir] [keys...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans import REGISTRY  # noqa: E402

# Keys whose builder performs real per-invocation work (stream replay,
# table commits) — builder-only timing would run that work, so skip.
SIDE_EFFECT = {
    "stream_tumbling_window",
    "stream_tumbling_multibatch",
    "upsert_merge_partitioned",
    "upsert_merge_snapshot",
    "upsert_merge_commit_only",
    "catalog_multi_table_txn",
    "table_delete_where",
    "table_delete_mor",
    "table_incremental_read",
    "table_changes_merge",
    "table_changes_append",
    "table_changes_feed",
    "table_changes_cursor",
    "table_changes_replace",
    "table_replace_overwrite",
    "table_partition_evolution",
    "table_branch_write_read",
    "table_branch_head_read",
    "table_changes_compacted",
    "table_snapshot_prune_read",
    "table_point_lookup_pruned",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = sys.argv[2:] or [k for k in HEADLINE if k not in SIDE_EFFECT]
    spark = get_spark("probe-builder")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for key in keys:
        fn = REGISTRY[key].fn
        df = fn(spark, sf_dir)
        materialize(df)  # warm layouts/caches/JIT
        bts, ets = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            bts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            materialize(df)
            ets.append(time.perf_counter() - t0)
        rows.append((min(bts), min(ets), key))
        print(
            f"build {min(bts)*1000:7.1f} ms   exec {min(ets)*1000:7.1f} ms   {key}",
            flush=True,
        )
    rows.sort(reverse=True)
    tot_b = sum(r[0] for r in rows)
    print(f"\nbuilder total {tot_b*1000:.0f} ms across {len(rows)} keys; biggest:")
    for b, e, k in rows[:15]:
        print(f"  {b*1000:7.1f} ms build ({e*1000:7.1f} ms exec)  {k}")


if __name__ == "__main__":
    main()
