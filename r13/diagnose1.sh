#!/usr/bin/env bash
# Round-13 diagnoses: (a) q_text_confusion's 6.3x at sf300 — 3-point curve
# (sf30/sf100/sf300) + a repeat at sf300 for variance; (b) q_text_decontam's
# 4.8x — ProbeDecon emission counts at sf30/sf100/sf300.
set -uo pipefail
cd /root/repo
OUT=r13/diagnose1.log
: > "$OUT"
for sf in tools/sf30 tools/sf100 tools/sf300 tools/sf300; do
  echo "== q_text_confusion $sf $(date +%T)" >> "$OUT"
  r12/benchone.sh q_text_confusion "$sf" 48g 2>&1 | grep -E "time=|Exception" | head -2 >> "$OUT"
done
for sf in tools/sf30 tools/sf100 tools/sf300; do
  echo "== ProbeDecon $sf $(date +%T)" >> "$OUT"
  r12/javarun.sh 48g graft.tools.ProbeDecon "$sf" 2>&1 | grep -E 'PROBE_DECON|Exception|No space' | head -3 >> "$OUT"
done
echo "DONE $(date +%T)" >> "$OUT"
