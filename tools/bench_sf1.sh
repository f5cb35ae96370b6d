#!/usr/bin/env bash
# Per-round ×10-scale bench cadence: time the 30 slowest queries (by
# the committed BENCH_DETAIL.json) against data/scale/x10, so scale
# regressions surface the round they are introduced instead of at
# audit time. ~2 min budget vs ~9 min for the full suite.
#
# Usage: tools/bench_sf1.sh [round-tag]   # writes BENCH_sf1_r<tag>.json
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:-dev}"
# the ONLY-filtered bench run rewrites BENCH_DETAIL.json with a partial
# map; restore the committed full-run artifact (the regression-gate
# baseline) on EVERY exit path — a mid-run failure must not leave the
# working tree holding a 30-query baseline for the next commit to pick up
trap 'git checkout -- BENCH_DETAIL.json 2>/dev/null || true' EXIT
SLOWEST=$(python3 - <<'EOF'
import json, subprocess
txt = subprocess.run(["git", "show", "HEAD:BENCH_DETAIL.json"],
                     capture_output=True, text=True).stdout
d = json.loads(txt or open("BENCH_DETAIL.json").read())
qs = sorted(d["queries"].items(), key=lambda kv: -kv[1])[:30]
print(",".join(k for k, _ in qs))
EOF
)
echo "bench_sf1: 30 slowest = $SLOWEST" >&2
SPARK_GRAFT_SF_DIR=data/scale/x10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY="$SLOWEST" SPARK_GRAFT_BASELINE=none \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"metric".*}' \
  > "BENCH_sf1_r${TAG}.json"
python3 - "$TAG" <<'EOF'
import json, sys
tag = sys.argv[1]
cur = json.load(open(f"BENCH_sf1_r{tag}.json"))
try:
    prev = json.load(open("BENCH_sf1.json"))["queries"]
except Exception:
    prev = {}
rows = []
for k, v in sorted(cur["queries"].items()):
    p = prev.get(k)
    rows.append((k, p, v, (v / p) if p else None))
print(f"{'query':28} {'prev':>7} {'now':>7} {'ratio':>6}")
for k, p, v, r in rows:
    print(f"{k:28} {p if p is not None else '-':>7} {v:>7} "
          f"{f'{r:.2f}' if r else '-':>6}")
print(f"total {cur['value']}s over {len(cur['queries'])} queries")
EOF
