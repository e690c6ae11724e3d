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


# Substrings in a builder's source that mark per-invocation side
# effects or state the frame cache must never capture (registry.py
# cache_frame exclusion rules). Source-scan is a FIRST filter only —
# every cache_frame flag still gets a manual review (a builder may
# delegate its side effect to an operator call the scan cannot see).
_IMPURE_SRC = (
    "localCheckpoint",
    "commit",
    "stream",
    ".write",
    "write_",
    "scratch_dir",
    "jdbc",
    "ensure_live",
    "foreachBatch",
    "conf.set",
    "xlsx",
    "excel",
    "orc",
    "sink",
    "quarantine",
    "overwrite",
)


def classify_all():
    """(pure_uncached, cached, impure) key lists for the whole
    registry, by source inspection of each builder."""
    import inspect

    pure, cached, impure = [], [], []
    for key in sorted(REGISTRY):
        fn = REGISTRY[key].fn
        if getattr(fn, "__wrapped__", None) is not None:
            cached.append(key)
            continue
        try:
            src = inspect.getsource(inspect.unwrap(fn))
        except (OSError, TypeError):
            impure.append(key)
            continue
        if any(m in src for m in _IMPURE_SRC) or key in SIDE_EFFECT:
            impure.append(key)
        else:
            pure.append(key)
    return pure, cached, impure


def main_all(sf_dir: str) -> None:
    """Registry-wide sweep (VERDICT r11 item 5): builder-only timing
    for every PURE un-cached key; prints the >100 ms cache_frame
    candidates. Execution is NOT timed here (keys outside the headline
    only ever run in oracle sweeps — the builder constant is the whole
    per-sweep saving)."""
    pure, cached, impure = classify_all()
    print(
        f"registry: {len(pure)} pure-uncached, {len(cached)} cached, "
        f"{len(impure)} impure/side-effect (skipped)"
    )
    spark = get_spark("probe-builder-all")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for key in pure:
        fn = REGISTRY[key].fn
        try:
            fn(spark, sf_dir)  # warm layouts / view memos
            bts = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir)
                bts.append(time.perf_counter() - t0)
            rows.append((min(bts), key))
        except Exception as exc:  # noqa: BLE001
            print(f"  SKIP {key}: {type(exc).__name__}: {exc}")
    rows.sort(reverse=True)
    print(f"\n{len(rows)} pure builders timed; >100 ms candidates:")
    for b, k in rows:
        if b >= 0.1:
            print(f"  {b*1000:7.1f} ms  {k}")
    print("\nfull table:")
    for b, k in rows:
        print(f"  {b*1000:7.1f} ms  {k}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--all":
        main_all(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
        return
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
