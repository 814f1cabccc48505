#!/bin/sh
# Build the --py-files artifact for cluster submission:
#
#   tools/package.sh                      # -> dist/libpostal_spark.zip
#   spark-submit --py-files dist/libpostal_spark.zip \
#       -m libpostal_spark --input ... --output ... --checkpoint ...
#
# The zip contains only the package (no tests/bench); __spark_entry__.py is
# the sandbox driver contract and is not needed on a cluster.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/libpostal_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/libpostal_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, names in os.walk("libpostal_spark"):
        if "__pycache__" in root:
            continue
        for n in sorted(names):
            if n.endswith(".py"):
                z.write(os.path.join(root, n))
print("wrote dist/libpostal_spark.zip")
EOF
unzip -l dist/libpostal_spark.zip | tail -3
