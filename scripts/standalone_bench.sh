#!/bin/bash
# Standalone-cluster N-vs-4N scaling demo (north_rule: "run by spark-submit
# ... at N and 4N executors"). Stands up a real Spark standalone master +
# worker on this host, then spark-submits the SAME jar twice:
#
#   config A: 1 executor  (--total-executor-cores 2, --executor-cores 2)
#   config B: 4 executors (--total-executor-cores 8, --executor-cores 2)
#
# Each executor is a separate JVM with its own heap and task threads — the
# closest a single box gets to a real cluster. Both configs sit below the
# measured memory-bandwidth knee (~16 threads, BENCH.md).
#
# usage: standalone_bench.sh [replicate] [trials]
# prerequisites: sbt package (jar) and a prep-artifact snapshot
# (scripts/child.sh prep 16 writes /dev/shm/graft-spark/bench-artifacts).
set -u
REPLICATE=${1:-64}
TRIALS=${2:-2}
export SPARK_HOME=/opt/spark
export SPARK_LOG_DIR=/tmp/spark-standalone-logs
export SPARK_WORKER_DIR=/tmp/spark-standalone-work
export SPARK_LOCAL_DIRS=${SPARK_GRAFT_LOCAL:-/dev/shm/graft-spark}/standalone
HOST=$(hostname)
MASTER=spark://$HOST:7077
ART=${SPARK_BENCH_ARTIFACTS:-/dev/shm/graft-spark/bench-artifacts}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
JAR=$(ls "$(dirname "$0")"/../target/scala-2.13/*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then echo "no jar — run: sbt package" >&2; exit 1; fi
if [ ! -d "$ART/meta" ]; then echo "no artifacts — run: scripts/child.sh prep 16" >&2; exit 1; fi
mkdir -p "$SPARK_LOCAL_DIRS"

"$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1
"$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1
"$SPARK_HOME/sbin/start-master.sh" --host "$HOST" --port 7077 --webui-port 0 || exit 1
# one worker offering 8 cores / 24g; executors are carved out of it
"$SPARK_HOME/sbin/start-worker.sh" "$MASTER" --cores 8 --memory 24g --webui-port 0 || exit 1
sleep 5

submit() { # submit <total-executor-cores>
  "$SPARK_HOME/bin/spark-submit" \
    --master "$MASTER" \
    --class graft.ClusterPipeline \
    --executor-cores 2 --executor-memory 5g --driver-memory 8g \
    --total-executor-cores "$1" \
    --conf spark.ui.enabled=false \
    --conf spark.local.dir="$SPARK_LOCAL_DIRS" \
    "$JAR" "$ART" "$SF" "$REPLICATE" "$TRIALS" 2>/dev/null \
    | grep -E "^(CLUSTER|CTRIAL)"
}

echo "== N executors (1 x 2 cores) =="
submit 2
echo "== 4N executors (4 x 2 cores) =="
submit 8

"$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1
"$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1
