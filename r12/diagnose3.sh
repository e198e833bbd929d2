#!/usr/bin/env bash
# Round-12 batch 3: measure the three scale fixes at the rungs that
# exposed the bugs (quiet box).
set -uo pipefail
cd /root/repo
OUT=r12/diagnose3.log
: > "$OUT"
run() { echo "== $* $(date +%T)" >> "$OUT"; "$@" 2>&1 | grep -E "time=|PROBE_" | head -8 >> "$OUT"; }
# boilerplate: literal-store scrub (was 436 s scrub at sf100)
run r12/javarun.sh 48g graft.tools.ProbeBoiler tools/sf30
run r12/javarun.sh 48g graft.tools.ProbeBoiler tools/sf100
# paragraph family: shuffle_hash reassembly (full was 25.0, incr 50.1)
run r12/benchone.sh q_dedup_paragraph tools/sf100 48g
run r12/benchone.sh q_dedup_para_incr tools/sf100 48g
run r12/benchone.sh q_dedup_para_incr tools/sf30 48g
run r12/benchone.sh q_dedup_paragraph tools/sf30 48g
# winnow: pinned self-join + candidate/output density
run r12/javarun.sh 48g graft.tools.ProbeWinnow tools/sf30
run r12/javarun.sh 48g graft.tools.ProbeWinnow tools/sf100
run r12/benchone.sh q_text_span_dedup tools/sf100 48g
echo "DONE $(date +%T)" >> "$OUT"
