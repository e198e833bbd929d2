#!/usr/bin/env bash
# Round-13 ask #6, phase 1: generate the sf300 scan rung — documents +
# embeddings only (the scan/text/dedup family inputs; the full star schema
# at mult 300 would be ~63 GB and exceed the box's free disk).
set -uo pipefail
cd /root/repo
r12/javarun.sh 48g graft.tools.Datagen tools/sf300 300 documents,embeddings
