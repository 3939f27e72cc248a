#!/bin/bash
# Interleaved same-window A/B of two compiled class trees through
# graft.tools.Explain (construct+run timings, no plans).
# usage: dev/ab_cp.sh <classesA> <classesB> <queries> <sfDir> <runs> <cpus> <passes>
A="$1"; B="$2"; Q="$3"; SF="$4"; N="${5:-1}"; CPUS="${6:-32}"; PASSES="${7:-3}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_CPUS="$CPUS"
run() {
  local cp="$1" tag="$2" pass="$3"
  java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
    -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$cp:/opt/spark/jars/*" graft.tools.Explain "$Q" "$SF" "$N" 2>/dev/null \
    | grep -E "construct|run " | sed "s/^/[$tag pass$pass] /"
}
for i in $(seq 1 "$PASSES"); do
  run "$A" A "$i"
  run "$B" B "$i"
done
