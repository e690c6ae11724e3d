import sys, time
sys.path.insert(0, "/root/repo")
from database_importer_spark.session import get_spark
from database_importer_spark.plans.part_a import (
    _snap_create_named, _snap_batch_touched, _pm_month_of, _PM_PART_COL, _SNAP_OUT_COLS
)
from database_importer_spark.operators.snapshot_table import (
    merge_snapshot_commit, merge_snapshot_prewrite, commit_added_entries,
    load_manifest, _read_with_deletes,
)
from pyspark.sql import functions as F, types as T

sf = "/root/repo/.bench/sf10"
spark = get_spark("probe_cm"); spark.sparkContext.setLogLevel("ERROR")

def tick(label, f):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = f(); ts.append(time.perf_counter() - t0)
    print(f"{label:34s} {min(ts):.3f}s  {[round(x,3) for x in ts]}")
    return r

loc = tick("create(memoized)", lambda: _snap_create_named(spark, sf, "cm", files=84))
bt = tick("batch+touched", lambda: _snap_batch_touched(spark, sf, loc))
batch, touched = bt
def prew():
    out, m, cands = merge_snapshot_prewrite(spark, loc, batch, ["o_orderkey"], _pm_month_of, touched)
    print("   candidates:", len(cands), "rows:", sum(e["rows"] for e in cands))
    out.write.format("noop").mode("overwrite").save()
tick("prewrite+noop", prew)
def full():
    v = merge_snapshot_commit(spark, loc, batch, ["o_orderkey"], _pm_month_of, touched)
    return v
v = tick("full commit", full)
m = load_manifest(loc, v)
schema = T.StructType.fromJson(m["schema"])
def readback():
    added = commit_added_entries(loc, v)
    df = _read_with_deletes(spark, loc, schema, added, [])
    df.filter(F.col(_PM_PART_COL).isin(touched)).select(*_SNAP_OUT_COLS).write.format("noop").mode("overwrite").save()
tick("added-files readback", readback)

# Measured decomposition at sf10 (r9, quiet-host mins):
#   batch+touched         0.27 s  (staging-derived batch: v0 pruned to
#                                  one month; source-scan variant was
#                                  0.38 s — tools/probe_cm2 A/B)
#   prewrite+noop         1.30 s  (batch broadcast materialization
#                                  ~0.2-0.4 + base streamed through 2
#                                  broadcast arms 2x0.14 + Merger py4j
#                                  construction 0.25)
#   full commit           1.72 s  (+write 196k rows, footer stats,
#                                  fsync'd manifest link)
#   added-files readback  0.14 s
# DuckDB's month-filtered merged-state CTAS: 0.20-0.37 s — it computes
# the same delta with NO durable write, no commit protocol, no
# broadcast materialization. The residual ratio is protocol cost, not
# plan shape (0 SMJ / 0 hash exchange on the target; the r8
# upsert_merge_snapshot decomposition's conclusion holds at the
# commit-only contract too).
