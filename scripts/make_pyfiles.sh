#!/bin/sh
# Package the engine for spark-submit --py-files (north rule).
# Produces build/engine.zip containing the dtaidistance_spark package.
set -e
cd "$(dirname "$0")/.."
mkdir -p build
rm -f build/engine.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("build/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("dtaidistance_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("build/engine.zip written")
EOF
