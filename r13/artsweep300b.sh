#!/usr/bin/env bash
# sf300 artifact sweep, take 2: the disk-hungry reassembly/winnow rows run
# FIRST (one-JVM sweeps accumulate lingering shuffle scratch until GC; the
# first take ran span_dedup 11th and it hit the disk ceiling the isolated
# run clears easily — r13/fixsweep.log: 20.5 s).
set -uo pipefail
cd /root/repo
ONLY='q_text_span_dedup$,q_text_winnow_auto$,q_dedup_paragraph$,q_dedup_para_incr$,q_text_encoding$,q_text_tokens$,q_text_pack$,q_text_readability$,q_text_confusion$,q_text_decontam$,q_text_lr_score$,q_text_boilerplate$'
SPARK_GRAFT_SF_DIR=tools/sf300 SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_COMPILE=0 SPARK_GRAFT_BENCH_OUT=bench_r13_sf300_scan.json \
  r12/javarun.sh 48g graft.Bench > r13/artsweep_sf300b.out 2>&1
echo "sf300b rc=$?"
echo DONE
