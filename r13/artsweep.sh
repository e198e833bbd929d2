#!/usr/bin/env bash
# Committed-artifact sweeps for the sf100/sf300 scan family (REPS=1 one-JVM
# sweep posture, spread n/a at 1 rep; same rows as r13/sf300sweep.log's
# fresh-JVM runs — both postures documented in SCALING_r13).
set -uo pipefail
cd /root/repo
ONLY='q_text_encoding$,q_text_tokens$,q_text_pack$,q_text_readability$,q_text_confusion$,q_text_decontam$,q_text_lr_score$,q_text_boilerplate$,q_dedup_paragraph$,q_dedup_para_incr$,q_text_span_dedup$,q_text_winnow_auto$'
SPARK_GRAFT_SF_DIR=tools/sf100 SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_COMPILE=0 SPARK_GRAFT_BENCH_OUT=bench_r13_sf100_scan.json \
  r12/javarun.sh 48g graft.Bench > r13/artsweep_sf100.out 2>&1
echo "sf100 rc=$?"
SPARK_GRAFT_SF_DIR=tools/sf300 SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_COMPILE=0 SPARK_GRAFT_BENCH_OUT=bench_r13_sf300_scan.json \
  r12/javarun.sh 48g graft.Bench > r13/artsweep_sf300.out 2>&1
echo "sf300 rc=$?"
echo DONE
