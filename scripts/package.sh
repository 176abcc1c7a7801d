#!/usr/bin/env bash
# Build the --py-files archive for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/fuzzymatch_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/fuzzymatch_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("fuzzymatch_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/fuzzymatch_spark.zip")
EOF
