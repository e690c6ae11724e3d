#!/bin/sh
# Full-registry sf10 oracle sweep in parallel alphabetical ranges.
#
# Serial, the 171-key sweep takes ~4 h wall: single-threaded pandas /
# DuckDB compare phases leave 32 cores idle. Three concurrent
# checkers (front / llm-family / back ranges) finish in ~75 min with
# ~65 GB peak RSS (measured r7; 128 GiB host). PASS lines in each log
# are the artifact of record for a killed run — the --json file only
# appears at a worker's clean exit — and tools/merge_sf10_sweep.py
# (or the inline merge below) folds logs + part JSONs into one file.
#
# Usage: sh tools/run_sf10_sweep.sh [SF_DIR] [OUT_JSON]
set -e
SF_DIR=${1:-/root/repo/.bench/sf10}
OUT=${2:-CORRECTNESS_LOCAL_sf10.json}
export PYTHONPATH=/root/repo

python - <<'EOF'
from database_importer_spark.plans import REGISTRY
ks = [k for k in sorted(REGISTRY) if "jdbc" not in k]  # Derby pair:
# connector-bound (embedded Derby, minutes-to-hours at scale) — the
# live pair is swept at sf1 instead, per the r6 verdict protocol.
i = next(i for i, k in enumerate(ks) if k.startswith("llm_"))
j = next(i for i, k in enumerate(ks) if k.startswith("sink_ob"))
open("/tmp/sweep_front.txt", "w").write(" ".join(ks[:i]))
open("/tmp/sweep_llm.txt", "w").write(" ".join(ks[i:j]))
open("/tmp/sweep_back.txt", "w").write(" ".join(ks[j:]))
print(f"front {i} / llm {j-i} / back {len(ks)-j} keys")
EOF

for part in front llm back; do
  # shellcheck disable=SC2046
  python tools/check_oracles.py "$SF_DIR" $(cat /tmp/sweep_$part.txt) \
    --json /tmp/sweep_$part.json > /tmp/sweep_$part.log 2>&1 &
done
wait

python - "$SF_DIR" "$OUT" <<'EOF'
import json, sys
results = {}
for part in ("front", "llm", "back"):
    d = json.load(open(f"/tmp/sweep_{part}.json"))
    results.update(d["results"] if "results" in d else d)
st = {}
for v in results.values():
    st[v["status"]] = st.get(v["status"], 0) + 1
json.dump(
    {"sf_dir": sys.argv[1],
     "note": "full registry minus live-JDBC pair; 3 parallel ranges",
     "results": {k: results[k] for k in sorted(results)}},
    open(sys.argv[2], "w"), indent=1)
print(f"{sys.argv[2]}: {len(results)} keys {st}")
EOF
