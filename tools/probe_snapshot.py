"""Decompose upsert_merge_snapshot's sf10 invocation (min-of-N per
stage, one session) — the committed floor evidence for its headline
ratio, same probe class as probe_upsert/probe_band.

Stages, in declared-key order:
  batch     — month-scoped update∪insert batch build + touched memo
  prewrite  — manifest prune + candidate read + broadcast merge arms,
              materialized to noop (the pure MERGE compute)
  commit    — write commit files + pyarrow footer stats + manifest
              link (the snapshot protocol's own cost over `prewrite`)
  readback  — full final-state read of the committed manifest
              (the oracle/audit contract, same as the twins')

Usage: PYTHONPATH=/root/repo python tools/probe_snapshot.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.operators.snapshot_table import (  # noqa: E402
    latest_version,
    merge_snapshot_commit,
    merge_snapshot_prewrite,
    read_snapshot,
)
from database_importer_spark.plans.part_a import (  # noqa: E402
    _SNAP_OUT_COLS,
    _pm_month_of,
    _snap_batch_touched,
    _snap_create,
    _snap_loc,
)

RUNS = 5


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def best(fn):
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    spark = get_spark("probe-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    loc = _snap_loc(spark, sf_dir)
    _snap_create(spark, sf_dir, loc)

    def batch_stage():
        b, t = _snap_batch_touched(spark, sf_dir, loc)
        mat(b)
        return b, t

    m, arr = best(batch_stage)
    print(f"batch+touched (warm memo): {m:.3f}s  {arr}")
    batch, touched = _snap_batch_touched(spark, sf_dir, loc)

    m, arr = best(
        lambda: mat(
            merge_snapshot_prewrite(
                spark, loc, batch, ["o_orderkey"], _pm_month_of, touched
            )[0]
        )
    )
    print(f"prewrite merge (noop):     {m:.3f}s  {arr}")

    m, arr = best(
        lambda: merge_snapshot_commit(
            spark, loc, batch, ["o_orderkey"], _pm_month_of, touched
        )
    )
    print(f"full commit:               {m:.3f}s  {arr}")

    v = latest_version(loc)
    m, arr = best(
        lambda: mat(read_snapshot(spark, loc, version=v).select(*_SNAP_OUT_COLS))
    )
    print(f"final-state readback:      {m:.3f}s  {arr}")


if __name__ == "__main__":
    main()
