#!/usr/bin/env bash
# Isolated ×10 retry of keys whose shared-suite sf1 sample looked
# elevated (BENCH_sf1_r12 vs r11): run each key ALONE in its own JVM
# against data/scale/x10 so suite position, block-manager pressure and
# box-load bursts cannot contaminate the number. Adjudication protocol
# per MEMORY (bench-noise-adjudication): never believe a one-run
# regression; an isolated retry either restores a clean number or
# names a real cause.
#
# Usage: tools/iso_retry.sh key1 key2 ...   # writes /tmp/iso_<key>.json
set -euo pipefail
cd "$(dirname "$0")/.."
trap 'git checkout -- BENCH_DETAIL.json 2>/dev/null || true' EXIT
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for k in "$@"; do
  echo "=== isolated run: $k ==="
  SPARK_GRAFT_SF_DIR=data/scale/x10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY="$k" SPARK_GRAFT_BASELINE=none \
  java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    2>/tmp/iso_"$k".err | grep -o '{"metric".*}' > /tmp/iso_"$k".json \
    || { echo "FAILED $k"; tail -5 /tmp/iso_"$k".err; }
  git checkout -- BENCH_DETAIL.json 2>/dev/null || true
  cat /tmp/iso_"$k".json
done
