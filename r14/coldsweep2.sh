#!/usr/bin/env bash
# Round-14 ask #1: clean-window, clean-disk COLD re-measure of the
# reassembly family on final-r14 code (fresh JVM per row via
# r12/benchone.sh; BenchOne clears all caches between warmup and the
# timed rep, and now stamps scratch disk before/after the timed rep).
# Span gets 3 reps (the r13 contradiction row -> min-of-3); others 2.
set -uo pipefail
cd /root/repo
OUT=r14/coldsweep2.log
: > "$OUT"
echo "free_disk_start=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
reps_for() { if [ "$1" = q_text_span_dedup ]; then echo 3; else echo 2; fi; }
for sf in tools/sf100 tools/sf300; do
  for q in q_text_span_dedup q_dedup_paragraph q_dedup_para_incr q_text_winnow_auto; do
    n=$(reps_for "$q")
    for rep in $(seq 1 "$n"); do
      echo "== $q $sf rep$rep $(date +%T)" >> "$OUT"
      r12/benchone.sh "$q" "$sf" 48g 2>&1 | grep -E "time=|No space|Exception" | head -3 >> "$OUT"
    done
  done
done
for rep in 1 2; do
  echo "== q_text_winnow_overlap tools/sf100 rep$rep $(date +%T)" >> "$OUT"
  r12/benchone.sh q_text_winnow_overlap tools/sf100 48g 2>&1 | grep -E "time=|Exception" | head -2 >> "$OUT"
done
echo "DONE $(date +%T) free_disk_end=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
