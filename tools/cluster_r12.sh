#!/usr/bin/env bash
# Round-12 cluster witness (round-11 verdict ask #5): take the cluster
# evidence one decade up for the exchange-heavy families. sf1 showed the
# semantic family at 1.28x and SRP-embedding at 1.34x vs local[32] — the
# two shapes most sensitive to real shuffle — so this runs the dedup/sim
# families at the generated sf10 (500k docs / 20k vectors) on the same
# 4-executor standalone topology, checks the AQE repartition pins and the
# corpus-aware hardBandConfig/keyBlocks dials under real executors, and
# bit-compares against a local[32] run of the same rows.
#
# Family posture mirrors the committed bench_r11_sf10_families.json: the
# radius-8 narrow-SimHash frontier rows and the mid-threshold semantic
# rows are skipped (established walls measured separately, stamped in the
# artifact's skip field), the wide-sketch rows run.
#
# Prereqs:
#   sbt package
#   /opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077
#   SPARK_WORKER_INSTANCES=4 SPARK_WORKER_CORES=8 SPARK_WORKER_MEMORY=24g \
#     /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077
#
# Usage: tools/cluster_r12.sh <outDir> <jar> [sf10Dir]
set -uo pipefail

OUT=${1:?usage: cluster_r12.sh <outDir> <jar> [sf10Dir]}
JAR=${2:?usage: cluster_r12.sh <outDir> <jar> [sf10Dir]}
SF10=${3:-/root/repo/tools/sf10}
MASTER=spark://127.0.0.1:7077
mkdir -p "$OUT"

SKIP="q_dedup_semantic,q_dedup_d4,q_dedup_simhash\$,q_dedup_simhash_k2\$"

# the dedup/sim/emb rows that run at the sf10 family posture
FAMS="q_dedup_exact q_dedup_keep_first q_dedup_keep_best q_dedup_provenance \
q_dedup_incremental q_dedup_minhash q_dedup_incr_near q_dedup_ngram_jaccard \
q_dedup_simhash_r3 q_dedup_simhash_wide q_dedup_simhash_wide_k2 \
q_dedup_embedding q_dedup_embedding_recall \
q_dedup_components q_dedup_near_keep_first q_dedup_components_incr \
q_dedup_components_incr_steady q_dedup_paragraph q_dedup_para_incr \
q_dedup_content_intersect q_dedup_content_except q_dedup_snapshot_diff \
q_dedup_compact_latest q_dedup_source_overlap q_dedup_source_overlap_approx \
q_sim_bruteforce_topk q_sim_lsh_topk q_sim_lsh_recall q_sim_ivf_topk \
q_sim_ivf_search q_sim_ivf_recall q_sim_pq_topk q_sim_pq_recall \
q_sim_ivfpq_topk q_sim_ivfpq_recall q_sim_sq_topk q_sim_sq_recall \
q_sim_bq_topk q_sim_bq_recall q_sim_hard_negatives q_sim_hard_positives \
q_sim_triplets q_sim_hard_neg_lsh q_sim_hard_pos_lsh \
q_sim_hard_neg_lsh_recall q_sim_hard_pos_lsh_recall \
q_emb_normalize q_emb_centroid q_emb_hash_embed q_emb_sq_codes \
q_emb_bq_codes q_emb_pca_norm q_emb_pca_whiten"

echo "== phase 1: dedup/sim family bench at sf10 on the cluster =="
SPARK_GRAFT_SF_DIR="$SF10" \
SPARK_GRAFT_BENCH_OUT="$OUT/BENCH_cluster_sf10.json" \
SPARK_GRAFT_ONLY="q_dedup,q_sim" \
SPARK_GRAFT_SKIP="$SKIP" \
SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master $MASTER --class graft.Bench \
  --conf spark.driver.memory=8g \
  --conf spark.executor.memory=16g --conf spark.executor.cores=8 \
  "$JAR" > "$OUT/bench.log" 2>&1
tail -1 "$OUT/BENCH_cluster_sf10.json" || echo "BENCH FAILED — see $OUT/bench.log"

echo "== phase 2: cluster Verify of the families at sf10 =="
/opt/spark/bin/spark-submit --master $MASTER --class graft.Verify \
  --conf spark.driver.memory=8g \
  --conf spark.executor.memory=16g --conf spark.executor.cores=8 \
  "$JAR" "$SF10" "$OUT/cl_verify" $FAMS > "$OUT/verify_cluster.log" 2>&1
echo "cluster verify done: $(ls "$OUT/cl_verify" | wc -l) tables"

echo "== phase 3: local[32] Verify of the same subset (bit-compare base) =="
/opt/spark/bin/spark-submit --master 'local[32]' --class graft.Verify \
  --conf spark.driver.memory=48g \
  "$JAR" "$SF10" "$OUT/lo_verify" $FAMS > "$OUT/verify_local.log" 2>&1
echo "local verify done: $(ls "$OUT/lo_verify" | wc -l) tables"

echo "== phase 4: sorted whole-row hash compare + recall floors =="
python3 - "$OUT/cl_verify" "$OUT/lo_verify" <<'EOF' | tee "$OUT/bitcompare_sf10.json"
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
# sketch-estimate rows are NOT bit-identity rows (merge-order-dependent
# HLL unions); compare within their own emitted error bound
APPROX_BOUND = {"q_dedup_source_overlap_approx":
    ("src_a, src_b", "n_shared_approx", "err_bound")}
recalls, floor_breaks = {}, 0
for d in sorted(os.listdir(cl)):
    if not os.path.isdir(os.path.join(cl, d)):
        continue
    a = glob.glob(os.path.join(cl, d, "*.parquet"))
    b = glob.glob(os.path.join(lo, d, "*.parquet"))
    if not a or not b:
        res[d] = "missing"; bad += 1; continue
    if d.endswith("_recall"):
        # recall meters: the CLUSTER value must hold the contracted floor
        row = con.execute(f"SELECT * FROM read_parquet({a!r})").fetchone()
        rec = row[-1]
        recalls[d] = rec
        if rec is not None and rec < 0.6:
            floor_breaks += 1
    if d in APPROX_BOUND:
        keys, val, bound = APPROX_BOUND[d]
        na, nb, viol, mx = con.execute(f"""
            SELECT (SELECT count(*) FROM read_parquet({a!r})),
                   (SELECT count(*) FROM read_parquet({b!r})),
                   count(*) FILTER (abs(x.{val} - y.{val}) > x.{bound}),
                   max(abs(x.{val} - y.{val}))
            FROM read_parquet({a!r}) x JOIN read_parquet({b!r}) y
              USING ({keys})""").fetchone()
        ok = na == nb and viol == 0
        res[d] = (f"approx_within_bound (max |delta|={mx})" if ok
                  else f"APPROX VIOLATION rows {na} vs {nb}, {viol} over bound")
        bad += 0 if ok else 1
        continue
    ha, hb = digest(a), digest(b)
    ok = ha == hb
    res[d] = "identical" if ok else f"MISMATCH {ha[0]} rows/{ha[1][:12]} vs {hb[0]} rows/{hb[1][:12]}"
    bad += 0 if ok else 1
print(json.dumps({"tables": len(res), "mismatches": bad,
                  "recalls_on_cluster": recalls, "recall_floor_breaks": floor_breaks,
                  "rows": res}, indent=1))
EOF

echo "== phase 5: DuckDB oracle sweep at sf10 (tractable oracled subset) =="
# probe-sided / group-by-shaped oracles that scale to 500k docs; the
# all-pairs exact-Jaccard oracles stay sf<=0.1
ORACLED="q_dedup_exact q_dedup_keep_first q_dedup_provenance \
q_dedup_incremental q_dedup_paragraph q_dedup_para_incr \
q_dedup_content_intersect q_dedup_content_except q_dedup_snapshot_diff \
q_dedup_compact_latest q_dedup_source_overlap \
q_sim_bruteforce_topk q_sim_hard_negatives q_sim_hard_positives q_sim_triplets \
q_sim_ivf_search q_sim_pq_topk q_sim_ivfpq_topk \
q_emb_normalize q_emb_centroid q_emb_hash_embed q_emb_sq_codes \
q_emb_bq_codes q_emb_pca_norm q_emb_pca_whiten"
python3 tools/oracle_check.py "$OUT/cl_verify" "$SF10" $ORACLED \
  --json="$OUT/CORRECTNESS_cluster_sf10.json"

echo "== done: artifacts under $OUT =="
