#!/usr/bin/env bash
# spark-submit --py-files packaging smoke (north rule: "run via
# spark-submit --py-files on a multi-executor cluster").
# Builds the engine zip, then runs bootstrap + one crawl epoch from a
# working directory OUTSIDE the repo so imports must resolve from the
# zip. On a real cluster, swap --master for the cluster manager URL.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f /tmp/hiispider_spark.zip
zip -qr /tmp/hiispider_spark.zip hiispider_spark -x '*__pycache__*'
rm -rf /tmp/hiispider_submit
cd /tmp
exec spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --driver-memory 8g \
  --py-files /tmp/hiispider_spark.zip \
  "$OLDPWD/tools/submit_job.py" /root/testdata/sf0.001 /tmp/hiispider_submit
