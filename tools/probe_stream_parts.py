"""Probe: stateful-replay shuffle partition count (state stores
opened/committed per partition PER BATCH — r5 set 4; with 4+ batches
the constant quadruples, so re-measure 2 vs 4 vs 8 on the multibatch
key).

Usage: python tools/probe_stream_parts.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.session import static_plan_session  # noqa: E402
from database_importer_spark.streaming import windows as W  # noqa: E402


def run_once(spark, sf_dir, parts):
    import shutil

    ev = W.read_events_stream_sliced(spark, sf_dir, slices=4)
    sdf = W.tumbling_counts(ev)
    W._QCOUNTER[0] += 1
    name = f"dbis_probe_stream_{W._QCOUNTER[0]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    ckpt = W._scratch_checkpoint_dir(name)
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        nb = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    out = spark.table(name)
    n = out.count()
    return nb, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe-stream-parts")
    spark.sparkContext.setLogLevel("ERROR")
    spark = static_plan_session(spark)
    res: dict[int, list[float]] = {1: [], 2: [], 4: [], 8: []}
    # warm
    run_once(spark, sf_dir, 4)
    for r in range(reps):
        order = [1, 2, 4, 8] if r % 2 == 0 else [8, 4, 2, 1]
        for p in order:
            t0 = time.perf_counter()
            nb, n = run_once(spark, sf_dir, p)
            res[p].append(time.perf_counter() - t0)
            if r == 0:
                print(f"parts={p}: batches={nb} rows={n}")
    for p, ts in sorted(res.items()):
        print(f"parts={p}", [round(x, 3) for x in ts], "min", round(min(ts), 3))


if __name__ == "__main__":
    main()
