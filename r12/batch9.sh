#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
OUT=r12/batch9.log
: > "$OUT"
run() { echo "== $* $(date +%T)" >> "$OUT"; "$@" 2>&1 | grep -E "time=|PROBE_" | head -4 >> "$OUT"; }
# merge-pinned reassembly at the rungs that matter
run r12/benchone.sh q_dedup_paragraph tools/sf100 48g
run r12/benchone.sh q_dedup_para_incr tools/sf100 48g
run r12/benchone.sh q_text_span_dedup tools/sf100 48g
run r12/benchone.sh q_dedup_paragraph tools/sf30 48g
run r12/benchone.sh q_dedup_para_incr tools/sf30 48g
echo "== fixed-rows sf100 sweep (merge pins) $(date +%T)" >> "$OUT"
SPARK_GRAFT_SF_DIR=/root/repo/tools/sf100 \
SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_ONLY="q_text_boilerplate\$,q_text_boilerplate_incr\$,q_dedup_paragraph\$,q_dedup_para_incr\$,q_text_span_dedup\$,q_text_winnow_overlap\$,q_text_pack\$,q_text_readability\$,q_text_confusion\$,q_text_decontam\$,q_text_lr_score\$,q_text_encoding\$,q_text_tokens\$" \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_r12_fixed_rows.json \
r12/javarun.sh 48g graft.Bench > r12/fixed_rows_bench.out 2>&1
echo "fixed-rows rc=$? $(date +%T)" >> "$OUT"
python3 -c "
import json; d=json.load(open('bench_r12_fixed_rows.json'))
print('total_norm %.1f failed %s' % (d['total_norm'], d['failed']))" >> "$OUT" 2>&1
echo "DONE $(date +%T)" >> "$OUT"
