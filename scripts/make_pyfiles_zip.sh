#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("timeseriesvectordbpattermatcher_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("engine.zip written")
EOF
