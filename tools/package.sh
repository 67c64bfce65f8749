#!/bin/sh
# Build dist/raptor_rag_spark.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/raptor_rag_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/raptor_rag_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("raptor_rag_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/raptor_rag_spark.zip")
EOF
