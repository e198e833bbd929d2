#!/usr/bin/env bash
# Round-12 diagnosis batch 2 (run on a quiet box):
#  - q_text_winnow_overlap sf100 clean re-run (first isolated run's warmup
#    overlapped a Verify sweep)
#  - q_dedup_para_incr at sf30 isolated (decade base for its 50 s sf100)
#  - q_dedup_paragraph at sf100 isolated (is the full pass super-linear too?)
#  - ProbeBoiler at sf30 and sf100 (store build vs scrub split)
set -uo pipefail
cd /root/repo
OUT=r12/diagnose2.log
: > "$OUT"
run() { echo "== $* $(date +%T)" >> "$OUT"; "$@" 2>&1 | grep -E "time=|PROBE_BOILER|REFUSING|Exception" | head -8 >> "$OUT"; }
run r12/benchone.sh q_text_winnow_overlap tools/sf100 48g
run r12/benchone.sh q_dedup_para_incr tools/sf30 48g
run r12/benchone.sh q_dedup_paragraph tools/sf100 48g
run r12/javarun.sh 48g graft.tools.ProbeBoiler tools/sf30
run r12/javarun.sh 48g graft.tools.ProbeBoiler tools/sf100
echo "DONE $(date +%T)" >> "$OUT"
