"""stream_tumbling_window floor probe (VERDICT r7 item 4).

Question: can a bounded availableNow replay get under 8x DuckDB at
sf10 by collapsing micro-batches?

Answer (measured, min-of-warm-runs at .bench/sf10, 10M events):
the replay ALREADY runs as ONE micro-batch — availableNow over the
single-file source dir processes all 10M rows in batch 0 (verified
via recentProgress; no maxFilesPerTrigger tuning can reduce batch
count below 1). The warm wall decomposes as:

    addBatch            ~0.77 s   (micro-batch execution)
      of which the identical BATCH plan over the same dir/schema/
      4-partition shuffle ("batch mirror") runs in ~0.46 s
      -> in-batch streaming machinery (StateStoreRestore/Save on 4
         partitions + complete-mode memory sink) ~ 0.3 s
    queryPlanning       ~0.15 s   (IncrementalExecution, per query)
    commitOffsets+WAL   ~0.10 s   (offset log on tmpfs)
    query start/stop    ~0.10 s   (StreamExecution lifecycle threads)
    -------------------------------------------------
    total               ~1.15 s   vs DuckDB ~0.085 s  => ~13x

The <= 8x target needs <= 0.65 s, i.e. less than the scan/agg floor
(0.46 s — itself the r5-documented 9x engine floor on this table)
PLUS any machinery at all. Every remaining component is the price of
actually running the streaming engine once: one planning pass, one
offset commit, one state commit, one query lifecycle. The floor is
irreducible at one batch; further reduction means not running
Structured Streaming (the batch twin exists for that, 0.44-0.46 s).

Usage: PYTHONPATH=/root/repo python tools/probe_stream_floor.py [sf_dir]
"""

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from database_importer_spark import get_spark
from database_importer_spark.session import static_plan_session
from database_importer_spark.streaming import windows as W
from database_importer_spark.streaming.windows import (
    EVENTS_RAW_SCHEMA_TS,
    _events_stream_dir,
    _events_ts_is_nanos,
    _scratch_checkpoint_dir,
)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
    spark0 = get_spark("probe_stream_floor")
    spark0.sparkContext.setLogLevel("ERROR")
    spark = static_plan_session(spark0)
    assert not _events_ts_is_nanos(sf), "probe assumes µs events corpus"

    # -- replay, instrumented (4 warm runs; report each) -------------
    for it in range(4):
        ev = W.read_events_stream(spark, sf)
        sdf = W.tumbling_counts(ev)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        ckpt = _scratch_checkpoint_dir(f"floorprobe{it}")
        t0 = time.perf_counter()
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"floorprobe{it}")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        p = q.recentProgress[-1]
        print(
            f"replay run{it}: wall {wall:.3f}s batches "
            f"{len(q.recentProgress)} rows {p['numInputRows']} "
            + json.dumps(p["durationMs"])
        )
        shutil.rmtree(ckpt, ignore_errors=True)

    # -- batch mirror of the micro-batch (same source/shape/parts) ---
    sd = _events_stream_dir(sf)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        ev = spark.read.schema(EVENTS_RAW_SCHEMA_TS).parquet(sd)
        (
            ev.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        times.append(round(time.perf_counter() - t0, 3))
    print(f"batch mirror runs: {times} (min {min(times)})")


if __name__ == "__main__":
    main()
