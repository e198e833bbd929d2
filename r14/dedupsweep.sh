#!/usr/bin/env bash
# Round-14 ask #6: the dedup/near-dup family cold-isolated at sf100 AND
# sf300. Fresh JVM per row, NOWARM single-shot posture (first-run timing,
# codegen included; rung-over-rung ratios comparable — both rungs share
# the posture, stamped nowarm=1 per line). One rep per (row, rung); the
# spread caveat travels with the artifact.
set -uo pipefail
cd /root/repo
OUT=r14/dedupsweep.log
: > "$OUT"
echo "free_disk_start=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
ROWS="q_dedup_minhash q_dedup_simhash_r3 q_dedup_simhash_wide \
      q_dedup_components q_dedup_components_incr q_dedup_embedding"
for sf in tools/sf100 tools/sf300; do
  for q in $ROWS; do
    echo "== $q $sf rep1 $(date +%T)" >> "$OUT"
    SPARK_GRAFT_NOWARM=1 r12/benchone.sh "$q" "$sf" 48g 2>&1 | grep -E "time=|No space|Exception|refus" | head -3 >> "$OUT"
  done
done
echo "DONE $(date +%T) free_disk_end=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
