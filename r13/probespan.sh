#!/usr/bin/env bash
# Round-13 ask #3: counts-prove dedupSpans' sf100 residual the ProbeWinnow
# way — ProbeSpan's duplicated-position payload per rung (sf1/sf30/sf100).
set -uo pipefail
cd /root/repo
OUT=r13/probespan.log
: > "$OUT"
for sf in tools/sf1 tools/sf30 tools/sf100; do
  echo "== ProbeSpan $sf $(date +%T)" >> "$OUT"
  r12/javarun.sh 48g graft.tools.ProbeSpan "$sf" 2>&1 | grep -E 'PROBE_SPAN|Exception|Error' | head -3 >> "$OUT"
done
echo "DONE $(date +%T)" >> "$OUT"
