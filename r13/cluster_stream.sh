#!/usr/bin/env bash
# Round-13 ask #7: cluster streaming witness — StreamBench's four serving
# twins on the real 4-executor standalone topology (real state-store
# placement, real executor memory) with the SAME state-contract assertions
# the local[32] run enforces (exit 3 on violation).
#
# Usage: r13/cluster_stream.sh  (expects jars built: sbt package Test/package)
set -uo pipefail
cd /root/repo
OUT=r13/cluster
mkdir -p "$OUT"
MAIN_JAR=$(ls target/scala-2.13/*.jar | grep -v tests | head -1)
TEST_JAR=$(ls target/scala-2.13/*-tests.jar | head -1)
MASTER=spark://127.0.0.1:7077

/opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077
SPARK_WORKER_INSTANCES=4 SPARK_WORKER_CORES=8 SPARK_WORKER_MEMORY=24g \
  /opt/spark/sbin/start-worker.sh $MASTER
sleep 8

/opt/spark/bin/spark-submit --master $MASTER --class graft.tools.StreamBench \
  --conf spark.driver.memory=8g \
  --conf spark.executor.memory=16g --conf spark.executor.cores=8 \
  --jars "$MAIN_JAR" \
  "$TEST_JAR" /root/testdata/sf0.01 "$OUT/STREAM_cluster_r13.json" 200 200 \
  > "$OUT/streambench_cluster.log" 2>&1
RC=$?
echo "StreamBench cluster rc=$RC" | tee -a "$OUT/streambench_cluster.log"

/opt/spark/sbin/stop-worker.sh || true
/opt/spark/sbin/stop-master.sh || true
exit $RC
