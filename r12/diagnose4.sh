#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
OUT=r12/diagnose4.log
: > "$OUT"
run() { echo "== $* $(date +%T)" >> "$OUT"; "$@" 2>&1 | grep -E "time=|PROBE_|Exception" | head -6 >> "$OUT"; }
run r12/javarun.sh 48g graft.tools.ProbeWinnow tools/sf30
run r12/javarun.sh 48g graft.tools.ProbeWinnow tools/sf100
run r12/benchone.sh q_text_winnow_overlap tools/sf30 48g
run r12/benchone.sh q_text_winnow_overlap tools/sf100 48g
echo "DONE $(date +%T)" >> "$OUT"
