#!/usr/bin/env bash
# Run a graft main class straight off the compiled classes + /opt/spark/jars,
# WITHOUT sbt — so a long background Verify (the hours-long sf0.1 leg) never
# holds the sbt build lock the interactive dev loop needs.
#   tools/run_java.sh graft.Verify /root/testdata/sf0.1 /tmp/out [queries...]
set -u
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "compile first (sbt compile)"; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_JAVA_OPTS: extra -D flags (e.g. a spark.graft.* conf — SparkConf
# picks up spark.* system properties, so this switches library modes
# without code changes: GRAFT_JAVA_OPTS=-Dspark.graft.cluster.docarray=bucketed)
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
