#!/usr/bin/env bash
# Round-14 ask #6, sf300 leg (trimmed): the rows whose sf100 cost makes a
# third rung affordable in the round's window. q_dedup_simhash_wide
# (>23 min at sf100) and q_dedup_embedding are documented as measured
# sf100 frontier points instead — their sf10->sf100 ratios already name
# the wall, and a 1-2 h sf300 take would buy one number the sweep table
# can state as a bound.
set -uo pipefail
cd /root/repo
OUT=r14/dedupsweep300.log
: > "$OUT"
echo "free_disk_start=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
for q in q_dedup_minhash q_dedup_simhash_r3 q_dedup_components q_dedup_components_incr; do
  echo "== $q tools/sf300 rep1 $(date +%T)" >> "$OUT"
  SPARK_GRAFT_NOWARM=1 r12/benchone.sh "$q" tools/sf300 48g 2>&1 | grep -E "time=|No space|Exception|refus" | head -3 >> "$OUT"
done
echo "DONE $(date +%T) free_disk_end=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
