#!/usr/bin/env bash
set -uo pipefail
cd /root/repo
OUT=r12/batch6.log
: > "$OUT"
echo "== StreamBench $(date +%T)" >> "$OUT"
r12/javarun.sh 16g graft.tools.StreamBench /root/testdata/sf0.01 STREAM_r12.json 200 200 \
  > r12/streambench.out 2> r12/streambench.err
echo "StreamBench rc=$? $(date +%T)" >> "$OUT"
python3 -c "
import json
d=json.load(open('STREAM_r12.json'))
for k,v in d.items():
    if isinstance(v,dict):
        print(k, 'contract_ok=',v['contract_ok'],'rows=',v['state_rows'],'bound=',v['state_bound'],'delta=',v['plateau_delta'])
" >> "$OUT" 2>&1
echo "DONE $(date +%T)" >> "$OUT"
