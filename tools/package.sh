#!/bin/sh
# Build the --py-files artifact for spark-submit (north rule: "run via
# spark-submit --py-files on a multi-executor cluster").
#   sh tools/package.sh [outdir]   ->  <outdir>/hps.zip
set -e
OUT="${1:-dist}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
python - "$OUT" <<'EOF'
import os, sys, zipfile
out = os.path.join(sys.argv[1], "hps.zip")
with zipfile.ZipFile(out, "w") as z:
    for root, dirs, files in os.walk("html_parser_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                z.write(os.path.join(root, f))
print(out)
EOF
echo "submit with:"
echo "  spark-submit --py-files $OUT/hps.zip jobs/extract_job.py --input <pages> --output <out>"
