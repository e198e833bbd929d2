#!/usr/bin/env bash
# Round-14 ask #6, sf300 retakes on a freed disk: the first takes died on
# shuffle scratch (the box's ~50 GB ceiling, contaminated further by
# crashed JVMs' leftover blockmgr dirs). tools/sf100 (21 GB, regenerable
# by Datagen) is deleted before this runs, giving sf300 rows ~70 GB of
# scratch headroom. Stale scratch is swept between rows — a crashed row
# must not tax its successor.
set -uo pipefail
cd /root/repo
OUT=r14/dedup300retake.log
: > "$OUT"
clean_scratch() {
  for d in /tmp/blockmgr-* /tmp/spark-*; do
    [ -e "$d" ] && [ "$d" != "/tmp/spark-local" ] && rm -rf "$d"
  done
}
for q in q_dedup_minhash q_dedup_components q_dedup_components_incr; do
  clean_scratch
  echo "== $q tools/sf300 rep1 $(date +%T) free=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
  SPARK_GRAFT_NOWARM=1 r12/benchone.sh "$q" tools/sf300 48g 2>&1 | grep -E "time=|No space|Exception|refus" | head -3 >> "$OUT"
done
clean_scratch
echo "DONE $(date +%T) free_disk_end=$(df -B1 --output=avail /tmp | tail -1 | tr -d ' ')" >> "$OUT"
