#!/usr/bin/env bash
# spark-submit --py-files packaging (north rule: "run via spark-submit
# --py-files"). Zips the library, ships it to executors, and runs the
# validation CLI. All runner flags pass through, e.g.:
#
#   tools/submit.sh --synth 1000000 --strict
#   tools/submit.sh --input /path/transcripts.parquet \
#       --checkpoint /tmp/manifest --violations-out /tmp/violations
#
# MASTER / CORES env vars override the local default; on a real cluster
# set MASTER=yarn / k8s:// and the same zip works unchanged.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CORES="${CORES:-32}"
MASTER="${MASTER:-local[$CORES]}"
ZIP="$(mktemp -d)/ocsf_validator_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" ocsf_validator_spark -x '*__pycache__*')
exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.enabled=true \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/tools/submit_entry.py" "$@"
