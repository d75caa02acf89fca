#!/usr/bin/env bash
# Package sketchlib for spark-submit --py-files (north rule: jobs run via
# spark-submit --py-files on the cluster).
#
#   scripts/make_pyfiles.sh [out.zip]
#   spark-submit --py-files sketchlib.zip sketchlib/jobs/pages_job.py \
#       --input iceberg:prod.web.pages --checkpoint s3://ckpt/du \
#       --output s3://out/du --query distinct-urls
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-sketchlib.zip}"
rm -f "$OUT"
zip -qr "$OUT" sketchlib -x '*__pycache__*' -x '*.pyc'
echo "$OUT"
