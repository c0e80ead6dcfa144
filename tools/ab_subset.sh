#!/bin/bash
# Same-host interleaved A/B subset bench (the r12 keep/revert protocol):
#   tools/ab_subset.sh <label> <comma-separated-queries> [iters]
# Runs bench.py on the subset and copies the detail JSON to
# /tmp/BENCH_DETAIL_r12_subset_<label>.json.  Interleave calls of this
# script with the code under test stashed vs restored; compare queries_min.
set -euo pipefail
label="$1"; queries="$2"; iters="${3:-3}"
export SPARK_GRAFT_BENCH_QUERIES="$queries"
export SPARK_GRAFT_BENCH_ITERS="$iters"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
cd "$(dirname "$0")/.."
python bench.py > "/tmp/ab_${label}.out" 2> "/tmp/ab_${label}.err"
cp BENCH_DETAIL_r12.json "/tmp/BENCH_DETAIL_r12_subset_${label}.json" 2>/dev/null || true
git checkout -- BENCH_DETAIL_r12.json 2>/dev/null || true
python - "$label" <<'EOF'
import json, sys
d = json.load(open(f"/tmp/BENCH_DETAIL_r12_subset_{sys.argv[1]}.json"))
q = d["queries_min"]
for k in sorted(q):
    print(f"{q[k]:7.3f}  {k}")
print(f"TOTAL {sum(q.values()):.3f}  ({sys.argv[1]})")
EOF
