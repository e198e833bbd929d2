#!/usr/bin/env bash
cd /root/repo
r13/probespan.sh
r13/sf300gen.sh > r13/sf300gen.log 2>&1
r13/sf300sweep.sh
echo "CHAIN DONE $(date +%T)" >> r13/chain.log
