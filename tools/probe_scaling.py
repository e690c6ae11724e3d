"""Core-scaling probe at a DISCRIMINATING scale factor (VERDICT r11
item 4): the driver's 32-vs-8-core block at sf0.1 reads ≈1 everywhere
because sub-second keys are constant-bound there. At sf1 the
data-bound keys separate: a key that parallelizes shows a low-core
slowdown approaching the core ratio; a constant-bound key stays ≈1.

Run once per core count (master is process-wide):
  SPARK_GRAFT_CPUS=32 python tools/probe_scaling.py sf_dir out32.json
  SPARK_GRAFT_CPUS=8  python tools/probe_scaling.py sf_dir out8.json
then merge with --table out32.json out8.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans import REGISTRY  # noqa: E402

# The biggest sf1 keys spanning both hypothesis classes: data-bound
# scan/shuffle/window shapes that SHOULD parallelize, and
# commit/stream/constant-bound shapes that should not.
KEYS = [
    "upsert_merge_full",
    "upsert_merge_bucketed",
    "upsert_merge_delta_rows",
    "upsert_merge_partitioned",
    "upsert_merge_snapshot",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "join_shuffle_sortmerge",
    "join_skew_aqe",
    "agg_hash_groupby",
    "agg_count_distinct",
    "win_rank_topk_per_group",
    "win_running_sum_rows",
    "llm_tfidf_cosine_pairs",
    "llm_dedup_near_minhash",
    "llm_similarity_topk",
    "fn_math_core",
    "udf_pandas_vectorized",
    "stream_tumbling_window",
]

RUNS = 3


def main() -> None:
    if sys.argv[1:2] == ["--table"]:
        hi = json.load(open(sys.argv[2]))
        lo = json.load(open(sys.argv[3]))
        ratio_cores = hi["cpus"] / lo["cpus"]
        print(
            f"| key | {hi['cpus']}c s | {lo['cpus']}c s | slowdown | class |"
        )
        print("|---|---|---|---|---|")
        for k in KEYS:
            a, b = hi["queries"].get(k), lo["queries"].get(k)
            if a is None or b is None:
                continue
            r = b / a
            klass = (
                "parallelizes"
                if r >= 1 + 0.5 * (ratio_cores - 1) / 2
                else ("partial" if r >= 1.35 else "constant-bound")
            )
            print(f"| {k} | {a:.3f} | {b:.3f} | {r:.2f}x | {klass} |")
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count()
    spark = get_spark("probe-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for key in KEYS:
        fn = REGISTRY[key].fn
        try:
            materialize(fn(spark, sf_dir))
            ts = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                ts.append(time.perf_counter() - t0)
            results[key] = round(min(ts), 3)
            print(f"{results[key]:8.3f} s  {key}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"  FAIL {key}: {type(exc).__name__}: {exc}", flush=True)
    doc = {"cpus": cpus, "sf_dir": sf_dir, "runs": RUNS, "queries": results}
    if out:
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
