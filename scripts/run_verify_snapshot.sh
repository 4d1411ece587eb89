#!/bin/bash
# Verify dump off a classes SNAPSHOT (no oracle compare — that runs
# separately so it can be sharded / memory-tuned).
# Usage: run_verify_snapshot.sh <sf_dir> <out_dir> <classes_dir> <heap>
set -e
SF_DIR=$1; OUT=$2; CLASSES=$3; HEAP=${4:-8g}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$OUT"
java $ADD_OPENS -Xmx"$HEAP" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Verify "$SF_DIR" "$OUT"
