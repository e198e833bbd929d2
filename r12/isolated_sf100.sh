#!/usr/bin/env bash
# Round-12 ask #1: re-run the sf100 super-linear rows ISOLATED (fresh JVM
# per row) at the same 48g posture as the committed sweep, to split
# one-JVM sweep memory pressure from genuine per-row nonlinearity.
# Controls: q_text_encoding / q_text_tokens (the sweep's linear floor).
set -uo pipefail
cd /root/repo
OUT=r12/isolated_sf100.log
: > "$OUT"
ROWS="q_text_encoding q_text_pack q_text_readability q_text_confusion q_text_decontam q_dedup_para_incr q_text_lr_score q_text_winnow_overlap q_text_boilerplate q_text_tokens"
for q in $ROWS; do
  echo "== $q $(date +%T)" >> "$OUT"
  r12/benchone.sh "$q" tools/sf100 48g 2>&1 | grep -E "time=|REFUSING|Exception|Error" | head -5 >> "$OUT"
done
echo "DONE $(date +%T)" >> "$OUT"
