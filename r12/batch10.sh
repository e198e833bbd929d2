#!/usr/bin/env bash
# Final evidence pass on the round-12 HEAD (50fe37e): every artifact the
# notes cite without a witness tag is produced AFTER the last src commit.
set -uo pipefail
cd /root/repo
OUT=r12/batch10.log
: > "$OUT"
echo "== fixed-rows sf100 sweep $(date +%T)" >> "$OUT"
SPARK_GRAFT_SF_DIR=/root/repo/tools/sf100 \
SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_ONLY="q_text_boilerplate\$,q_text_boilerplate_incr\$,q_dedup_paragraph\$,q_dedup_para_incr\$,q_text_span_dedup\$,q_text_winnow_overlap\$,q_text_pack\$,q_text_readability\$,q_text_confusion\$,q_text_decontam\$,q_text_lr_score\$,q_text_encoding\$,q_text_tokens\$" \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench_r12_fixed_rows.json \
r12/javarun.sh 48g graft.Bench > r12/fixed_rows_bench.out 2>&1
echo "fixed-rows rc=$? $(date +%T)" >> "$OUT"
echo "== ProbeSpan sf30 $(date +%T)" >> "$OUT"
r12/javarun.sh 48g graft.tools.ProbeSpan tools/sf30 2>&1 | grep PROBE_ >> "$OUT"
echo "== ProbeSpan sf100 $(date +%T)" >> "$OUT"
r12/javarun.sh 48g graft.tools.ProbeSpan tools/sf100 2>&1 | grep PROBE_ >> "$OUT"
echo "== StreamBench $(date +%T)" >> "$OUT"
r12/javarun.sh 16g graft.tools.StreamBench /root/testdata/sf0.01 STREAM_r12.json 200 200 \
  > r12/streambench.out 2> r12/streambench.err
echo "StreamBench rc=$? $(date +%T)" >> "$OUT"
echo "== BENCH_LOCAL full sf0.1 $(date +%T)" >> "$OUT"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LOCAL.json \
r12/javarun.sh 8g graft.Bench > r12/bench_local.out 2>&1
echo "BENCH_LOCAL rc=$? $(date +%T)" >> "$OUT"
echo "DONE $(date +%T)" >> "$OUT"
