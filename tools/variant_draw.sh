#!/bin/bash
# One crawl-bench-child draw with EXTRA JVM flags, bracketed by window
# probes — for A/B-ing GC / huge-page / codec variants at a fixed rung.
# usage: EXTRA_JVM="-XX:+UseParallelGC" EXTRA_ENV="K=V" \
#        variant_draw.sh <cores> [pages] [hosts] [body] [waves] [seedstep]
set -u
CORES=$1
PAGES=${2:-1200000}
HOSTS=${3:-$((PAGES/50))}
BODY=${4:-16000}
WAVES=${5:-2}
STEP=${6:-2}
DIR=/tmp/zenospark-bench-corpus-cache/p${PAGES}_h${HOSTS}_b${BODY}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
 --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
COMMON="-Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
EXTRA_JVM=${EXTRA_JVM:-}
java $OPENS $COMMON -cp "$CP" graft.tools.ProbeMain 32 1
T0=$(date +%s.%N)
env ${EXTRA_ENV:-X=1} java $OPENS $COMMON $EXTRA_JVM -XX:ActiveProcessorCount=$CORES -cp "$CP" \
  graft.tools.CrawlBenchChild "$DIR" "$CORES" "$WAVES" "$PAGES" "$HOSTS" "$BODY" "$STEP"
T1=$(date +%s.%N)
echo "CHILD_WALL $(echo "$T1 $T0" | awk '{printf "%.1f", $1-$2}') EXTRA=[$EXTRA_JVM]"
java $OPENS $COMMON -cp "$CP" graft.tools.ProbeMain 32 1
