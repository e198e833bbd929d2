#!/usr/bin/env bash
# Run any graft main class via plain java with build.sbt's forked options:
#   r12/javarun.sh <mem> <class> [args...]
set -uo pipefail
MEM=${1:?mem}; CLS=${2:?class}; shift 2
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
  -cp "$CP" "$CLS" "$@"
