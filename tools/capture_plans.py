"""Capture .explain("formatted") for declared keys to files — the
optimization-round evidence artifacts (plans/rNN/<key>_<suffix>.txt).

Usage: python tools/capture_plans.py OUT_DIR SUFFIX [sf_dir] [keys...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from database_importer_spark import get_spark  # noqa: E402
from database_importer_spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    keys = sys.argv[4:] or HEADLINE
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        try:
            df = REGISTRY[key].fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{key}_{suffix}.txt"), "w") as f:
            f.write(f"-- {key} @ {sf_dir} ({suffix})\n{txt}\n")
        print(key, flush=True)


if __name__ == "__main__":
    main()
