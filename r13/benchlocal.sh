#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
r12/javarun.sh 64g graft.Bench
