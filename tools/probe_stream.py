"""Decompose the streaming replay tax (VERDICT r4 #3): the bounded
availableNow replay of `stream_tumbling_window` costs ~0.5-1.1 s
where the batch twin costs ~60-500 ms. Candidate levers, each A/B'd
against the declared path:

  * checkpoint dir on tmpfs (/dev/shm) — offset log + state commits
    become memory-speed instead of disk fsyncs;
  * RocksDB state store provider (large-state tool — expected to
    LOSE at this state size; measured for the record);
  * adaptive execution off (fixed micro-batch shape);
  * 1 vs 4 state-store partitions (per-partition open/commit cost).

Usage: PYTHONPATH=/root/repo python tools/probe_stream.py <sf_dir>
"""

from __future__ import annotations

import sys
import time

from database_importer_spark.session import get_spark
from database_importer_spark.streaming import windows as W

_N = [0]


def run(spark, sf_dir, mode="complete", parts="4", ckpt=None, rocksdb=False):
    ev = W.read_events_stream(spark, sf_dir)
    sdf = W.tumbling_counts(ev)
    _N[0] += 1
    name = f"probe_stream_{_N[0]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_prov = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    try:
        w = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
        )
        if ckpt:
            w = w.option("checkpointLocation", f"{ckpt}/{name}")
        q = w.start()
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if rocksdb and prev_prov:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_prov
            )
        elif rocksdb:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return spark.table(name)


def timed(label, fn, runs=4):
    fn()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(times):7.3f}s")


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("probe_stream")
    spark.sparkContext.setLogLevel("ERROR")
    from database_importer_spark.session import static_plan_session

    noaqe = static_plan_session(spark)

    timed("declared path (4 parts, tmp ckpt)", lambda: run(spark, sf_dir))
    timed("ckpt on /dev/shm", lambda: run(spark, sf_dir, ckpt="/dev/shm/dbis_ck"))
    timed("1 state partition", lambda: run(spark, sf_dir, parts="1"))
    timed("1 part + shm ckpt", lambda: run(spark, sf_dir, parts="1", ckpt="/dev/shm/dbis_ck"))
    timed("no-AQE session", lambda: run(noaqe, sf_dir))
    timed("no-AQE + shm + 1 part", lambda: run(noaqe, sf_dir, parts="1", ckpt="/dev/shm/dbis_ck"))
    timed("rocksdb provider", lambda: run(spark, sf_dir, rocksdb=True))

    import shutil

    shutil.rmtree("/dev/shm/dbis_ck", ignore_errors=True)


if __name__ == "__main__":
    main()
