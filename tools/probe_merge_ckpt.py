"""A/B: lazy vs eager localCheckpoint of the merge source, sf10.

The merge's per-invocation fixed jobs are (1) Merger.__init__'s
isEmpty, (2) validate_unique_keys, (3) the checkpoint materialization.
With eager=False, (1) computes the un-checkpointed source plan for
partition 0 and (2) re-computes it fully while writing the checkpoint;
with eager=True the materialization runs ONCE up front and (1)/(2)
scan cached blocks. Interleaved min-of-N.

Usage: PYTHONPATH=/root/repo python tools/probe_merge_ckpt.py <sf_dir>
"""

import sys
import time

from database_importer_spark.operators.merge import Merger
from database_importer_spark.plans.part_a import _insert_source_df, _updates_df
from database_importer_spark.plans.registry import t
from database_importer_spark.session import get_spark


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def run_merge(spark, sf_dir, eager, delta):
    target = t(spark, sf_dir, "orders")
    src = (
        _updates_df(spark, sf_dir)
        .unionByName(_insert_source_df(spark, sf_dir))
        .localCheckpoint(eager=eager)
    )
    m = Merger(target, src, join_on=["o_orderkey"])
    out = m.merged_delta(update=True, insert=True) if delta else m.merged(
        update=True, insert=True
    )
    mat(out)


def main():
    sf_dir = sys.argv[1]
    runs = 5
    spark = get_spark("probe-merge-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "delta_lazy": lambda: run_merge(spark, sf_dir, False, True),
        "delta_eager": lambda: run_merge(spark, sf_dir, True, True),
        "full_lazy": lambda: run_merge(spark, sf_dir, False, False),
        "full_eager": lambda: run_merge(spark, sf_dir, True, False),
    }
    for fn in variants.values():
        fn()  # warm
    times = {k: [] for k in variants}
    for _ in range(runs):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k}: min {min(ts)*1000:.0f} ms  runs {[round(x,3) for x in ts]}")


if __name__ == "__main__":
    main()
