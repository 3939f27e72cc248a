#!/bin/bash
# Run graft.tools.Explain against the CURRENTLY COMPILED classes (no sbt
# recompile — used to capture before/after plans from a known build).
# usage: dev/explain_cp.sh <query[,query...]> [sfDir] [runs] [cpus]
Q="$1"; SF="${2:-/root/testdata/sf0.001}"; N="${3:-0}"; CPUS="${4:-8}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_CPUS="$CPUS"
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
  -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${GRAFT_CP:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" \
  graft.tools.Explain "$Q" "$SF" "$N"
