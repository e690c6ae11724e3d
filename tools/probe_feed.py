"""Decompose table_changes_feed's sf10 cost per version step.

The feed key reads v0..v3 of the 'feed' table in ONE read_changes
call; this probe times each step's sub-read separately (same plans the
range read unions) to show where the 4-6x ratio lives:

  v0->v1 (pure append)  : plain scan of added files — the fast path
  v1->v2 (merge)        : digest-diff of removed+added (the
                          table_changes_merge oracle-asymmetry class)
  v2->v3 (compact)      : SKIPPED by op-tag — zero jobs, zero cost

Usage: PYTHONPATH=/root/repo python tools/probe_feed.py [sf_dir]
"""
import sys, time

sys.path.insert(0, "/root/repo")
from database_importer_spark.session import get_spark
from database_importer_spark.plans.part_a import _feed_table
from database_importer_spark.operators.snapshot_table import read_changes

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
spark = get_spark("probe_feed")
spark.sparkContext.setLogLevel("ERROR")
loc, head = _feed_table(spark, sf)

def tick(label, lo, hi, n=5):
    df = read_changes(spark, loc, lo, hi, ["o_orderkey"])
    df.write.format("noop").mode("overwrite").save()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        read_changes(spark, loc, lo, hi, ["o_orderkey"]).write.format(
            "noop"
        ).mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"v{lo}->v{hi}  {label:22s} min {min(ts):.3f}s  {ts}", flush=True)

tick("append fast path", 0, 1)
tick("merge digest diff", 1, 2)
tick("compact (skipped)", 2, 3)
tick("full range", 0, head)

# Measured at sf10 (r9, min-of-5 per step):
#   v0->v1 append fast path   0.437 s  (plain scan of the 8.1M-row
#                                       append's files — no diff)
#   v1->v2 merge digest diff  1.625 s  (the dominant cost: removed+
#                                       added month-slice scans + the
#                                       24 B/row digest shuffle + fetch
#                                       join + window classification —
#                                       the table_changes_merge
#                                       oracle-asymmetry class: DuckDB
#                                       replays the batch from source
#                                       knowledge, never diffing state)
#   v2->v3 compact (skipped)  0.230 s  (zero diff jobs — empty-frame +
#                                       per-query constants; without
#                                       the op-tag skip this step would
#                                       digest-diff the WHOLE table)
#   v0->v3 full range         1.769 s  (< append+merge serial sum:
#                                       the union's steps schedule
#                                       together)
