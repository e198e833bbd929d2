#!/usr/bin/env bash
# Round-14 ask #7: cluster witness for the r13/r14 measure-then-choose
# plans — span/paragraph reassembly and the winnow guard have only
# local[32] evidence; run them on the real 4-executor standalone topology
# at sf10 (the r12 protocol) and bit-compare against local[32].
# The broadcast decisions (measured counts), the ScratchCache release
# listener, and the winnow guard all execute with real executor memory
# and a real exchange fabric here.
#
# Prereqs: sbt package Test/package; tools/sf10 generated (Datagen).
# Usage: r14/cluster_r14.sh
set -uo pipefail
cd /root/repo
OUT=r14/cluster
mkdir -p "$OUT"
MAIN_JAR=$(ls target/scala-2.13/*.jar | grep -v tests | head -1)
SF10=tools/sf10
MASTER=spark://127.0.0.1:7077

ROWS="q_text_span_dedup q_dedup_paragraph q_dedup_para_incr \
q_text_winnow_overlap q_text_winnow_auto"

/opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077 || true
SPARK_WORKER_INSTANCES=4 SPARK_WORKER_CORES=8 SPARK_WORKER_MEMORY=24g \
  /opt/spark/sbin/start-worker.sh $MASTER || true
sleep 8

echo "== phase 1: cluster Verify of the reassembly/winnow rows at sf10 =="
/opt/spark/bin/spark-submit --master $MASTER --class graft.Verify \
  --conf spark.driver.memory=8g \
  --conf spark.executor.memory=16g --conf spark.executor.cores=8 \
  "$MAIN_JAR" "$SF10" "$OUT/cl_verify" $ROWS > "$OUT/verify_cluster.log" 2>&1
echo "cluster verify rc=$? tables=$(ls "$OUT/cl_verify" 2>/dev/null | wc -l)"

echo "== phase 2: local[32] Verify of the same rows (bit-compare base) =="
/opt/spark/bin/spark-submit --master 'local[32]' --class graft.Verify \
  --conf spark.driver.memory=48g \
  "$MAIN_JAR" "$SF10" "$OUT/lo_verify" $ROWS > "$OUT/verify_local.log" 2>&1
echo "local verify rc=$? tables=$(ls "$OUT/lo_verify" 2>/dev/null | wc -l)"

echo "== phase 3: sorted whole-row hash compare =="
python3 - "$OUT/cl_verify" "$OUT/lo_verify" <<'EOF' | tee "$OUT/bitcompare_r14_sf10.json"
import sys, os, glob, json, hashlib, duckdb
cl, lo = sys.argv[1], sys.argv[2]
con = duckdb.connect()
def digest(files):
    rows = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
    h = hashlib.sha256()
    for r in sorted(str(t) for t in rows):
        h.update(r.encode()); h.update(b"\x00")
    return len(rows), h.hexdigest()
res, bad = {}, 0
for d in sorted(os.listdir(cl)):
    if not os.path.isdir(os.path.join(cl, d)):
        continue
    a = glob.glob(os.path.join(cl, d, "*.parquet"))
    b = glob.glob(os.path.join(lo, d, "*.parquet"))
    if not a or not b:
        res[d] = "missing"; bad += 1; continue
    ha, hb = digest(a), digest(b)
    ok = ha == hb
    res[d] = "identical" if ok else (
        f"MISMATCH {ha[0]} rows/{ha[1][:12]} vs {hb[0]} rows/{hb[1][:12]}")
    bad += 0 if ok else 1
print(json.dumps({"tables": len(res), "mismatches": bad, "rows": res}, indent=1))
EOF

/opt/spark/sbin/stop-worker.sh || true
/opt/spark/sbin/stop-master.sh || true
echo "== done: artifacts under $OUT =="
