#!/usr/bin/env bash
# Round-13 ask #6, phase 2: the scan family + the three round-12 fixed rows
# one more decade up, ISOLATED (fresh JVM per row, 48g — the r12 posture),
# with per-rung probe counts carried so any new super-linearity arrives
# pre-diagnosed. sf100 rows re-measured on r13 HEAD for same-HEAD ratios.
set -uo pipefail
cd /root/repo
OUT=r13/sf300sweep.log
: > "$OUT"
ROWS="q_text_encoding q_text_tokens q_text_pack q_text_readability q_text_confusion q_text_decontam q_text_lr_score q_text_boilerplate q_dedup_paragraph q_dedup_para_incr q_text_span_dedup q_text_winnow_auto"
for sf in tools/sf100 tools/sf300; do
  for q in $ROWS; do
    echo "== $q $sf $(date +%T)" >> "$OUT"
    r12/benchone.sh "$q" "$sf" 48g 2>&1 | grep -E "time=|REFUSING|Exception|Error|candidate|solved" | head -6 >> "$OUT"
  done
done
# the fixed-dial winnow row at sf300: EXPECTED to trip the new candidate-
# volume guard (predicted 3.3e9 > the 2e9 default ceiling) — the log line
# is the witness that the n^2 default now fails loudly instead of running
echo "== q_text_winnow_overlap tools/sf300 (guard-trip witness) $(date +%T)" >> "$OUT"
r12/benchone.sh q_text_winnow_overlap tools/sf300 48g 2>&1 | grep -E "time=|candidate pairs|IllegalArgument|Exception" | head -8 >> "$OUT"
# probes at sf300 (sf30/sf100 counts already committed r12; span probe
# re-run by r13/probespan.sh)
for p in ProbeBoiler ProbeSpan; do
  echo "== $p tools/sf300 $(date +%T)" >> "$OUT"
  r12/javarun.sh 48g graft.tools.$p tools/sf300 2>&1 | grep -E 'PROBE_|Exception|Error' | head -4 >> "$OUT"
done
echo "DONE $(date +%T)" >> "$OUT"
# ProbeWinnow extras at sf300: counts-only at the w=4 default (the guard's
# evidence) and the full join at the solved window w=28 (the bounded path)
echo "== ProbeWinnow tools/sf300 w=4 counts-only $(date +%T)" >> "$OUT"
r12/javarun.sh 48g graft.tools.ProbeWinnow tools/sf300 4 0 2>&1 | grep -E 'PROBE_|Exception' | head -3 >> "$OUT"
echo "== ProbeWinnow tools/sf300 w=28 full $(date +%T)" >> "$OUT"
r12/javarun.sh 48g graft.tools.ProbeWinnow tools/sf300 28 1 2>&1 | grep -E 'PROBE_|Exception' | head -3 >> "$OUT"
echo "== ProbeWinnow tools/sf100 w=9 full (the sf100 solver dial) $(date +%T)" >> "$OUT"
r12/javarun.sh 48g graft.tools.ProbeWinnow tools/sf100 9 1 2>&1 | grep -E 'PROBE_|Exception' | head -3 >> "$OUT"
echo "ALLDONE $(date +%T)" >> "$OUT"
