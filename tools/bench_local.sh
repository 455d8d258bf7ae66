#!/bin/bash
# Local bench sweep under driver-equivalent conditions.
# Usage: tools/bench_local.sh [qid-prefix,qid-prefix,...]
# With a prefix list, sets SPARK_GRAFT_ONLY (dev-only filter in Bench).
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ONLY="${1:-}"
env ${ONLY:+SPARK_GRAFT_ONLY=$ONLY} \
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  java $ADD_OPENS -Xmx100g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2>/dev/null | grep -E '^\{'
