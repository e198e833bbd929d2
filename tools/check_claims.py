#!/usr/bin/env python3
"""Cited-number gate (round-12 verdict ask #4): evidence_check.sh verifies
that cited ARTIFACTS exist; this verifies that cited NUMBERS match them.
The round-12 motivating drifts: notes said "588.9 s normalized" where the
committed artifact held total_norm=473.6, and "161.8 s" where the sweep
row was 84.4 — both favored reality over the notes, but either direction
is a phantom citation.

Every headline `X s` / `N x` number in BENCH_NOTES_r{N}.md / SCALING_r{N}.md
that names a JSON artifact must carry a machine-checkable claim annotation
(an HTML comment, invisible in rendered markdown):

    <!-- claim: <artifact.json> <dot.path> <value> [tol=<p>%] -->

e.g.  <!-- claim: bench_r13_rows.json queries_norm.q_text_span_dedup 84.4 tol=1% -->

The checker loads the artifact (first JSON object per line; multi-line
files are parsed whole), resolves the dot path, and compares with relative
tolerance (default 2%). Exit 1 on any mismatch, unresolvable path, or
missing artifact. Round docs >= r13 with ZERO claims also fail: a notes
file citing no checkable number defeats the gate's purpose.

Usage: tools/check_claims.py <round> [docs...]
"""
import json
import re
import sys
from pathlib import Path

CLAIM_RE = re.compile(
    r"<!--\s*claim:\s*(\S+\.json)\s+(\S+)\s+(-?[0-9.eE+]+)"
    r"(?:\s+tol=([0-9.]+)%)?\s*-->")


def load_json(path: Path):
    text = path.read_text()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # one-JSON-object-per-line artifacts: take the first parseable line
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        raise


def resolve(obj, dotted):
    cur = obj
    for part in dotted.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        elif isinstance(cur, list) and part.lstrip("-").isdigit():
            cur = cur[int(part)]
        else:
            raise KeyError(dotted)
    return cur


def main():
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    rnd = sys.argv[1]
    docs = [Path(d) for d in sys.argv[2:]] or [
        Path(f"BENCH_NOTES_r{rnd}.md"), Path(f"SCALING_r{rnd}.md")]
    fail = 0
    for doc in docs:
        if not doc.exists():
            continue
        claims = CLAIM_RE.findall(doc.read_text())
        if not claims and int(rnd) >= 13:
            print(f"CLAIM FAIL: {doc} carries no claim annotations — "
                  "annotate its headline numbers (see tools/check_claims.py)",
                  file=sys.stderr)
            fail = 1
            continue
        for art, path, value, tol in claims:
            tol = float(tol) / 100 if tol else 0.02
            apath = Path(art)
            if not apath.exists():
                print(f"CLAIM FAIL: {doc} claims against missing artifact "
                      f"{art}", file=sys.stderr)
                fail = 1
                continue
            try:
                actual = resolve(load_json(apath), path)
            except Exception as e:
                print(f"CLAIM FAIL: {doc}: {art} has no field '{path}' "
                      f"({type(e).__name__})", file=sys.stderr)
                fail = 1
                continue
            want = float(value)
            if not isinstance(actual, (int, float)):
                print(f"CLAIM FAIL: {doc}: {art}:{path} is not numeric "
                      f"({actual!r})", file=sys.stderr)
                fail = 1
            elif abs(actual - want) > tol * max(abs(want), 1e-12):
                print(f"CLAIM FAIL: {doc} cites {art}:{path} = {want} but "
                      f"the artifact holds {actual} (tol {tol:.1%})",
                      file=sys.stderr)
                fail = 1
            else:
                print(f"claim ok: {doc.name}: {art}:{path} = {actual} "
                      f"(cited {want})")
    if fail == 0:
        print(f"CLAIMS OK (round {rnd})")
    return fail


if __name__ == "__main__":
    sys.exit(main())
