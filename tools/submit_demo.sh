#!/usr/bin/env bash
# Deploy-contract demo (north_rule: "run via spark-submit --py-files"):
# package the engine, submit the job with the package shipped to
# executors.  Usage: tools/submit_demo.sh <files.parquet> <work_dir>
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=${1:?files.parquet path}
WORK=${2:?work dir}
ZIP=$(mktemp -u /tmp/codedup_XXXX.zip)
zip -qr "$ZIP" codedup -x '*__pycache__*'

JOB=$(mktemp /tmp/codedup_job_XXXX.py)
cat > "$JOB" <<'EOF'
import sys
from pyspark.sql import SparkSession
from codedup import pipeline
from codedup.config import DedupConfig

spark = SparkSession.builder.appName("codedup-submit").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
res = pipeline.run(spark, [sys.argv[1]], DedupConfig(), work_dir=sys.argv[2], run_id="submit")
print("SUBMIT_OK", res.report["summary"])
spark.stop()
EOF

SPARK_SUBMIT=$(python -c "import pyspark,os;print(os.path.join(os.path.dirname(pyspark.__file__),'bin','spark-submit'))")
exec "$SPARK_SUBMIT" --master "${SPARK_MASTER:-local[8]}" --py-files "$ZIP" "$JOB" "$SRC" "$WORK"
