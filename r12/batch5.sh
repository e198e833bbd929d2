#!/usr/bin/env bash
# Round-12 batch 5 (quiet box):
#  A) ask #3 witness: two same-HEAD q_dedup_embedding runs at sf10 under
#     the new pinned exchange — spread must be <= 1.2x
#  B) ask #6 witness: StreamBench 200 batches with the state contract
#     enforced -> STREAM_r12.json
set -uo pipefail
cd /root/repo
OUT=r12/batch5.log
: > "$OUT"
run() { echo "== $* $(date +%T)" >> "$OUT"; "$@" 2>&1 | grep -E "time=|Exception|STATE CONTRACT" | head -6 >> "$OUT"; }
run r12/benchone.sh q_dedup_embedding tools/sf10 48g
run r12/benchone.sh q_dedup_embedding tools/sf10 48g
echo "== StreamBench $(date +%T)" >> "$OUT"
r12/javarun.sh 16g graft.tools.StreamBench /root/testdata/sf0.01 STREAM_r12.json 200 200 \
  > r12/streambench.out 2> r12/streambench.err
echo "StreamBench rc=$? $(date +%T)" >> "$OUT"
grep -E "contract_ok|state_contract_enforced" STREAM_r12.json | head -6 >> "$OUT" || true
echo "DONE $(date +%T)" >> "$OUT"
