#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
OUT=r12/batch7.log
: > "$OUT"
echo "== local sf10 family bench $(date +%T)" >> "$OUT"
SPARK_GRAFT_SF_DIR=/root/repo/tools/sf10 \
SPARK_GRAFT_ONLY="q_dedup,q_sim" \
SPARK_GRAFT_SKIP="q_dedup_semantic,q_dedup_d4,q_dedup_simhash\$,q_dedup_simhash_k2\$" \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_r12_sf10_families.json \
r12/javarun.sh 48g graft.Bench > r12/local_sf10_bench.out 2>&1
echo "local bench rc=$? $(date +%T)" >> "$OUT"
echo "== retry the 5 DuckDB-OOM oracles $(date +%T)" >> "$OUT"
python3 tools/oracle_check.py r12/cluster/cl_verify tools/sf10 \
  q_sim_bruteforce_topk q_sim_hard_positives q_sim_ivfpq_topk q_sim_pq_topk q_sim_triplets \
  --json=r12/cluster/oracle_retry.json >> "$OUT" 2>&1
echo "DONE $(date +%T)" >> "$OUT"
