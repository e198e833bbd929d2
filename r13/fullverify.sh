#!/usr/bin/env bash
cd /root/repo
rm -rf /tmp/v13full
r12/javarun.sh 32g graft.Verify /root/testdata/sf0.01 /tmp/v13full 2> /tmp/v13full_err.log
python3 tools/oracle_check.py /tmp/v13full /root/testdata/sf0.01 --json=r13/correctness_dryrun_sf001.json
