#!/usr/bin/env bash
# Round-14 ask #6: the dedup/near-dup family cold-isolated at sf100 AND
# sf300 (the r13 rung swept scan+reassembly only). Fresh JVM per row;
# decade ratios read sf300/sf100 against the 3.0x linear floor.
set -uo pipefail
cd /root/repo
OUT=r14/dedupsweep.log
: > "$OUT"
echo "free_disk_start=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
ROWS="q_dedup_minhash q_dedup_near_keep_first q_dedup_ngram_jaccard \
      q_dedup_simhash_r3 q_dedup_simhash_wide \
      q_dedup_components q_dedup_components_incr q_dedup_embedding"
for sf in tools/sf100 tools/sf300; do
  for q in $ROWS; do
    for rep in 1 2; do
      echo "== $q $sf rep$rep $(date +%T)" >> "$OUT"
      r12/benchone.sh "$q" "$sf" 48g 2>&1 | grep -E "time=|No space|Exception|refus" | head -3 >> "$OUT"
    done
  done
done
echo "DONE $(date +%T) free_disk_end=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
