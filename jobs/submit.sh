#!/usr/bin/env bash
# Package the engine and run the two jobs via spark-submit --py-files.
# Usage: jobs/submit.sh <input_parquet> <index_dir> <queries_ndjson> <out>
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f /tmp/light_splade_spark.zip
zip -qr /tmp/light_splade_spark.zip light_splade_spark -x '*__pycache__*'

MASTER="${SPARK_MASTER:-local[$( (nproc) 2>/dev/null || echo 8)]}"
COMMON=(--master "$MASTER" --py-files /tmp/light_splade_spark.zip
        --conf spark.sql.adaptive.enabled=true
        --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}")

spark-submit "${COMMON[@]}" jobs/build_index_job.py \
    --input "$1" --index-dir "$2" --n-shard-groups 4 "${@:5}"

spark-submit "${COMMON[@]}" jobs/query_job.py \
    --index-dir "$2" --queries "$3" --output "$4" --top-k 10
