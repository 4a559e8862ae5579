#!/bin/bash
# Drive graft.tools.ScalingProbe at 1x/4x/16x sf0.1 — ONE JVM PER SCALE
# so block-manager residue from one scale cannot contaminate the next —
# then fit per-family growth exponents and print the SCALING.md table.
# Usage: scripts/scaling.sh [sfDir] [out.jsonl]
set -euo pipefail
DIR="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/graft_scaling.jsonl}"
: > "$OUT"
for K in 1 4 16; do
  sbt -batch "Test/runMain graft.tools.ScalingProbe $DIR $K" 2>/dev/null \
    | grep -o '{"k":.*}' >> "$OUT"
done
python3 - "$OUT" <<'EOF'
import json, math, sys
runs = {r["k"]: r["families"] for r in map(json.loads, open(sys.argv[1]))}
fams = list(runs[1].keys())
print(f"| family | t(1x) s | t(4x) s | t(16x) s | alpha(1-16) | alpha(max adj) |")
print(f"| --- | --- | --- | --- | --- | --- |")
for f in fams:
    t1, t4, t16 = runs[1][f], runs[4][f], runs[16][f]
    a = math.log(t16 / t1) / math.log(16)
    aa = max(math.log(t4 / t1) / math.log(4), math.log(t16 / t4) / math.log(4))
    print(f"| {f} | {t1:.2f} | {t4:.2f} | {t16:.2f} | {a:.2f} | {aa:.2f} |")
EOF
