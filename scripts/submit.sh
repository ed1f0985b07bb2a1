#!/usr/bin/env bash
# Package the engine and run it via spark-submit --py-files (north_rule
# deployment shape). Works against local[*] here; on a real cluster point
# --master at YARN/K8s and add the Iceberg runtime package for --sink iceberg.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/wprdc_etl_spark.zip
(cd "$REPO" && rm -f "$ZIP" && zip -qr "$ZIP" wprdc_etl_spark -x '*__pycache__*')

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "${SPARK_MASTER:-local[32]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  "$REPO/wprdc_etl_spark/__main__.py" "$@"
