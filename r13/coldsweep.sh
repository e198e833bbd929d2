#!/usr/bin/env bash
# Honest COLD re-measure of every row the r13 persists touched (BenchOne
# now clears caches between warmup and the timed rep).
set -uo pipefail
cd /root/repo
OUT=r13/coldsweep.log
: > "$OUT"
for sf in tools/sf100 tools/sf300; do
  for q in q_text_span_dedup q_dedup_paragraph q_dedup_para_incr q_text_winnow_auto; do
    echo "== $q $sf $(date +%T)" >> "$OUT"
    r12/benchone.sh "$q" "$sf" 48g 2>&1 | grep -E "time=|No space|Exception" | head -3 >> "$OUT"
  done
done
echo "== q_text_winnow_overlap tools/sf100 $(date +%T)" >> "$OUT"
r12/benchone.sh q_text_winnow_overlap tools/sf100 48g 2>&1 | grep -E "time=|Exception" | head -2 >> "$OUT"
echo "DONE $(date +%T)" >> "$OUT"
