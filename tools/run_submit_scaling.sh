#!/bin/sh
# N-vs-4N scaling through the spark-submit deploy path: interleaved
# repeats at both sizes, min per leg (co-tenant noise on this box only
# ADDS time). Usage: tools/run_submit_scaling.sh [docs] [pairs]
set -e
cd "$(dirname "$0")/.."
sh tools/package.sh >/dev/null
DOCS="${1:-120000}"
PAIRS="${2:-3}"
ZIP="$(pwd)/dist/raptor_rag_spark.zip"
JOB="$(pwd)/tools/submit_scaling.py"
OUT="$(pwd)/bench_out/submit_scaling.jsonl"
: > "$OUT"
cd /tmp
i=1
while [ "$i" -le "$PAIRS" ]; do
    for CORES in 2 8; do
        spark-submit --master "local[$CORES]" \
            --conf spark.sql.shuffle.partitions=64 \
            --py-files "$ZIP" "$JOB" "$DOCS" 2>/dev/null \
            | grep '"elapsed"' >> "$OUT"
    done
    i=$((i + 1))
done
python3 - "$OUT" <<'EOF'
import json, sys
runs = {}
for line in open(sys.argv[1]):
    r = json.loads(line)
    runs.setdefault(r["cores"], []).append(r["elapsed"])
(small, wide) = sorted(runs)
s, w = min(runs[small]), min(runs[wide])
eff = (s / w) / (wide / small)
print(json.dumps({
    "path": "spark-submit --py-files",
    "cores": [small, wide], "min_elapsed": [s, w],
    "all_runs": runs, "speedup": round(s / w, 3),
    "scaling_efficiency": round(eff, 3),
}))
EOF
