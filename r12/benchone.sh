#!/usr/bin/env bash
# Run graft.tools.BenchOne via plain java (no sbt lock contention):
#   r12/benchone.sh <query> <sfDir> [mem]
# Replicates build.sbt's forked-JVM options (add-opens, UTC, no UI).
set -uo pipefail
Q=${1:?query}; SF=${2:?sfDir}; MEM=${3:-48g}
cd /root/repo
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx$MEM -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.tools.BenchOne "$Q" "$SF"
