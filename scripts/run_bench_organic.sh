#!/bin/bash
# Organic-SF bench board off a classes SNAPSHOT (so sbt compiles stay
# unblocked during multi-hour runs). Usage:
#   run_bench_organic.sh <sf_dir> <classes_dir> <heap> <runs> <out_json> [note]
set -e
SF_DIR=$1; CLASSES=$2; HEAP=$3; RUNS=$4; OUT=$5; NOTE=${6:-}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_RUNS="$RUNS" SPARK_GRAFT_BENCH_OUT="$OUT" \
java $ADD_OPENS -Xmx"$HEAP" -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" graft.Bench
