#!/bin/bash
# Build dist/acrawler_spark.zip for `spark-submit --py-files`.
# Pure-stdlib (python zipfile) so it runs anywhere pyspark does.
set -eu
cd "$(dirname "$0")/.."
python3 - <<'EOF'
import os, zipfile

os.makedirs("dist", exist_ok=True)
out = "dist/acrawler_spark.zip"
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("acrawler_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(out)
EOF
