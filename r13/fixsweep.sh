#!/usr/bin/env bash
# Round-13: the changed-set-gated reassembly measured at the two top rungs
# (fresh JVM per row, 48g), plus the sliced exact ProbeSpan at sf300.
set -uo pipefail
cd /root/repo
OUT=r13/fixsweep.log
: > "$OUT"
for sf in tools/sf100 tools/sf300; do
  for q in q_text_span_dedup q_dedup_paragraph q_dedup_para_incr; do
    echo "== $q $sf $(date +%T)" >> "$OUT"
    r12/benchone.sh "$q" "$sf" 48g 2>&1 | grep -E "time=|REFUSING|Exception|No space" | head -4 >> "$OUT"
  done
done
echo "== ProbeSpan tools/sf300 sliced x8 $(date +%T)" >> "$OUT"
r12/javarun.sh 48g graft.tools.ProbeSpan tools/sf300 8 2>&1 | grep -E 'PROBE_SPAN |Exception|No space' | head -4 >> "$OUT"
echo "DONE $(date +%T)" >> "$OUT"
