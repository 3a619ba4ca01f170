#!/bin/bash
# Run graft.tools.Scale java-direct (no sbt lock) against the compiled
# classes. Usage:
#   tools/scale_run.sh "5000,50000,500000" "coreness,scc" [trials] [shuffle]
# Env passthrough: SPARK_GRAFT_TRIALS, SPARK_GRAFT_SHUFFLE, SCALE_MEM.
set -u
SIZES="${1:?sizes csv}"
OPS="${2:-}"
TRIALS="${3:-${SPARK_GRAFT_TRIALS:-2}}"
SHUFFLE="${4:-${SPARK_GRAFT_SHUFFLE:-32}}"
MEM="${SCALE_MEM:-90g}"
CLASSES="/root/repo/target/scala-2.13/classes"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_TRIALS="$TRIALS" SPARK_GRAFT_SHUFFLE="$SHUFFLE" \
exec java $ADD_OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.local.dir=/tmp/spark-scale \
  ${SCALE_ADVISORY:+-Dspark.sql.adaptive.advisoryPartitionSizeInBytes=$SCALE_ADVISORY} \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.tools.Scale "$SIZES" $OPS
