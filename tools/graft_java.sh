#!/bin/bash
# Run a graft main (graft.Verify / graft.Bench) directly on `java`, without
# sbt. Spark 4 on JDK 17 needs the --add-opens set below when SparkSession
# is created outside spark-submit (build.sbt applies the same list to forked
# sbt runs — see jdk17AddOpens). Without them, DateType decode in
# memory-sink streaming queries fails with EXPRESSION_DECODING_FAILED
# (sun.util.calendar not accessible) and kryo ByteBuffer access throws —
# phantom failures an sbt run never shows.
#
# Usage: tools/graft_java.sh -Xmx24g graft.Verify /root/testdata/sf0.01 /tmp/out
set -euo pipefail
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
REPO="$(cd "$(dirname "$0")/.." && pwd)"
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
