#!/usr/bin/env python3
"""Convert BenchOne sweep logs into a claims-checkable JSON artifact.

Input lines look like:
  == q_text_span_dedup tools/sf100 rep1 21:55:16
  q_text_span_dedup: time=52.25 s heap=51.5g data=21.4g disk_before=48.4g disk_after=48.4g

Output (one JSON object): {"<query>.<rung>": {"reps": [..], "min": .., "spread": ..,
                            "disk_before_g": [..], "disk_after_g": [..]}, ...}
keyed also as flat "min" fields for dot-path claims:
  {"q_text_span_dedup": {"sf100": {"min": 52.25, ...}, ...}}

Usage: r14/log2json.py <log> <out.json>
"""
import json
import re
import sys

HDR = re.compile(r"^== (\S+) tools/(\S+?)(?: rep\d+)? ")
ROW = re.compile(
    r"^(\S+): time=([0-9.]+) s .*?"
    r"(?:disk_before=([0-9.]+)g disk_after=([0-9.]+)g)?\s*$")

def main(log, out):
    cur = None
    acc = {}
    for line in open(log):
        m = HDR.match(line)
        if m:
            cur = (m.group(1), m.group(2))
            continue
        m = ROW.match(line.strip())
        if m and cur and m.group(1) == cur[0]:
            q, rung = cur
            d = acc.setdefault(q, {}).setdefault(rung, {
                "reps": [], "disk_before_g": [], "disk_after_g": []})
            d["reps"].append(float(m.group(2)))
            if m.group(3):
                d["disk_before_g"].append(float(m.group(3)))
                d["disk_after_g"].append(float(m.group(4)))
    for q in acc:
        for rung, d in acc[q].items():
            d["min"] = min(d["reps"])
            d["spread"] = (max(d["reps"]) / min(d["reps"])
                           if min(d["reps"]) > 0 else None)
    json.dump(acc, open(out, "w"), indent=1, sort_keys=True)
    print(f"{out}: {sum(len(v) for v in acc.values())} (query, rung) rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
