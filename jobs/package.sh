#!/bin/sh
# Build the --py-files artifact for spark-submit.
#   sh jobs/package.sh  →  dist/lucene_solr_spark.zip
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/lucene_solr_spark.zip
python3 - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/lucene_solr_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("lucene_solr_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            # .bin: marshal data blobs loaded via importlib.resources
            # (e.g. analysis/stempel_data.bin), readable from the zip
            if f.endswith((".py", ".bin")):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/lucene_solr_spark.zip")
EOF
