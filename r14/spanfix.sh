#!/usr/bin/env bash
# Round-14 span fix measure: dedupSpans(persistIndex=true) cold isolated,
# SAME posture as the r14/coldsweep2 baseline (warmup + clearAll + timed).
set -uo pipefail
cd /root/repo
OUT=r14/spanfix.log
: > "$OUT"
for sf in tools/sf100 tools/sf300; do
  for rep in 1 2; do
    echo "== q_text_span_dedup $sf rep$rep $(date +%T)" >> "$OUT"
    r12/benchone.sh q_text_span_dedup "$sf" 48g 2>&1 | grep -E "time=|No space|Exception" | head -3 >> "$OUT"
  done
done
echo "DONE $(date +%T)" >> "$OUT"
