#!/usr/bin/env bash
# Round-11 cluster witness (round-10 ask #4: the script existed, its outputs did not) at the sf1 rung (verdict ask #5): the round-9
# scale fixes (parallel-scan roots, merge hints, scale-aware banding dials)
# had only ever run multi-executor at sf0.1 — this runs the bench AND a
# correctness sweep for the dedup/similarity/embedding families at sf1 on
# the same standalone topology fault_run.sh used.
#
# Prereqs:
#   sbt package
#   /opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077
#   SPARK_WORKER_INSTANCES=4 SPARK_WORKER_CORES=8 SPARK_WORKER_MEMORY=24g \
#     /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077
#
# Usage: tools/cluster_r11.sh <outDir> <jar> [sf1Dir]
set -uo pipefail

OUT=${1:?usage: cluster_r11.sh <outDir> <jar> [sf1Dir]}
JAR=${2:?usage: cluster_r11.sh <outDir> <jar> [sf1Dir]}
SF1=${3:-/root/repo/tools/sf1}
MASTER=spark://127.0.0.1:7077
mkdir -p "$OUT"

# the dedup/similarity/embedding families (the rows the round-9 scale
# fixes touched), every row that runs at sf1
FAMS="q_dedup_exact q_dedup_keep_first q_dedup_keep_best q_dedup_provenance \
q_dedup_incremental q_dedup_minhash q_dedup_incr_near q_dedup_ngram_jaccard \
q_dedup_simhash q_dedup_simhash_k2 q_dedup_simhash_r3 q_dedup_embedding \
q_dedup_components q_dedup_near_keep_first q_dedup_components_incr \
q_dedup_components_incr_steady q_dedup_paragraph q_dedup_para_incr \
q_dedup_semantic q_dedup_semantic_steady q_dedup_semantic_recall \
q_dedup_semantic_white q_dedup_embedding_recall q_dedup_d4 \
q_dedup_content_intersect q_dedup_content_except q_dedup_snapshot_diff \
q_dedup_compact_latest q_dedup_source_overlap q_dedup_source_overlap_approx \
q_sim_bruteforce_topk q_sim_lsh_topk q_sim_lsh_recall q_sim_ivf_topk \
q_sim_ivf_search q_sim_ivf_recall q_sim_pq_topk q_sim_pq_recall \
q_sim_ivfpq_topk q_sim_ivfpq_recall q_sim_sq_topk q_sim_sq_recall \
q_sim_bq_topk q_sim_bq_recall q_sim_hard_negatives q_sim_hard_positives \
q_sim_triplets q_sim_hard_neg_lsh q_sim_hard_pos_lsh \
q_sim_hard_neg_lsh_recall q_sim_hard_pos_lsh_recall \
q_emb_normalize q_emb_centroid q_emb_hash_embed q_emb_sq_codes \
q_emb_bq_codes q_emb_pca_norm q_emb_pca_var q_emb_pca_whiten"

echo "== phase 1: full bench at sf1 on the cluster =="
SPARK_GRAFT_SF_DIR="$SF1" \
SPARK_GRAFT_BENCH_OUT="$OUT/BENCH_cluster_r11.json" \
SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
/opt/spark/bin/spark-submit --master $MASTER --class graft.Bench \
  --conf spark.driver.memory=8g \
  --conf spark.executor.memory=16g --conf spark.executor.cores=8 \
  "$JAR" > "$OUT/bench.log" 2>&1
tail -1 "$OUT/BENCH_cluster_r11.json" || echo "BENCH FAILED — see $OUT/bench.log"

echo "== phase 2: cluster Verify of the dedup/sim/emb families at sf1 =="
/opt/spark/bin/spark-submit --master $MASTER --class graft.Verify \
  --conf spark.driver.memory=8g \
  --conf spark.executor.memory=16g --conf spark.executor.cores=8 \
  "$JAR" "$SF1" "$OUT/cl_verify" $FAMS > "$OUT/verify_cluster.log" 2>&1
echo "cluster verify done: $(ls "$OUT/cl_verify" | wc -l) tables"

echo "== phase 3: local[32] Verify of the same subset (bit-compare base) =="
/opt/spark/bin/spark-submit --master 'local[32]' --class graft.Verify \
  --conf spark.driver.memory=48g \
  "$JAR" "$SF1" "$OUT/lo_verify" $FAMS > "$OUT/verify_local.log" 2>&1
echo "local verify done: $(ls "$OUT/lo_verify" | wc -l) tables"

echo "== phase 4: sorted whole-row hash compare (cluster vs local) =="
python3 - "$OUT/cl_verify" "$OUT/lo_verify" <<'EOF' | tee "$OUT/bitcompare.json"
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
# sketch-estimate rows are NOT bit-identity rows: a DataSketches HLL union
# is merge-order-dependent by design, so a different topology legitimately
# shifts the estimates — compare those within their own emitted err_bound
APPROX_BOUND = {"q_dedup_source_overlap_approx":
    ("src_a, src_b", "n_shared_approx", "err_bound")}
for d in sorted(os.listdir(cl)):
    if not os.path.isdir(os.path.join(cl, d)):
        continue  # oracle_sql.json rides along in the verify dir
    a = glob.glob(os.path.join(cl, d, "*.parquet"))
    b = glob.glob(os.path.join(lo, d, "*.parquet"))
    if not a or not b:
        res[d] = "missing"; bad += 1; continue
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
print(json.dumps({"tables": len(res), "mismatches": bad, "rows": res}, indent=1))
EOF

echo "== phase 5: DuckDB oracle sweep at sf1 (tractable subset) =="
# rows whose oracle SQL scales to 50k docs/vectors (probe-sided or
# group-by-shaped; the all-pairs exact-Jaccard oracles are sf<=0.1 only)
ORACLED="q_dedup_d4 q_dedup_exact q_dedup_keep_first q_dedup_keep_best q_dedup_provenance \
q_dedup_incremental q_dedup_paragraph q_dedup_para_incr \
q_dedup_content_intersect q_dedup_content_except q_dedup_snapshot_diff \
q_dedup_compact_latest q_dedup_source_overlap \
q_sim_bruteforce_topk q_sim_hard_negatives q_sim_hard_positives q_sim_triplets \
q_emb_normalize q_emb_centroid q_emb_hash_embed q_emb_sq_codes \
q_emb_bq_codes q_emb_pca_norm q_emb_pca_whiten"
python3 tools/oracle_check.py "$OUT/cl_verify" "$SF1" $ORACLED \
  --json="$OUT/CORRECTNESS_cluster_sf1.json"

echo "== done: artifacts under $OUT =="
