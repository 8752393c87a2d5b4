#!/usr/bin/env bash
# spark-submit --py-files launcher (north rule launch path).
#
#   tools/submit.sh <master> <sf_dir> <out> [extra job args...]
#   tools/submit.sh local[8] /root/testdata/sf0.001 /tmp/pr_out
#
# Packages graphscope_spark into a zip and ships it with --py-files —
# the job script itself never sees the repo on sys.path, proving the
# packaged-library launch works. On a real cluster swap <master> for
# yarn / k8s:// and scale executors with --num-executors; the zip and
# job body are unchanged at N and 4N executors.
set -euo pipefail

MASTER="${1:?master, e.g. local[8]}"
SF_DIR="${2:?input parquet dir}"
OUT="${3:?output path}"
shift 3

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/graphscope_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" graphscope_spark -x '*__pycache__*')

CORES="$(python3 - "$MASTER" <<'EOF'
import re, sys
m = re.search(r'local\[(\d+|\*)\]', sys.argv[1])
print(m.group(1) if m and m.group(1) != '*' else 8)
EOF
)"

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="$CORES" \
  "$REPO/tools/job_pagerank.py" "$SF_DIR" "$OUT" "$@"
