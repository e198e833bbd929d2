#!/usr/bin/env python3
"""Cited-number gate (round-12 verdict ask #4, extended round 14):
evidence_check.sh verifies that cited ARTIFACTS exist; this verifies that
cited NUMBERS match them. The round-12 motivating drifts: notes said
"588.9 s normalized" where the committed artifact held total_norm=473.6.
The round-13 motivating hole: the gate only verified ANNOTATED claims, so
SCALING_r13 SS2's headline table carried 6.2/20.5 s span numbers that
existed in NO committed artifact and the gate passed anyway.

Every headline `X s` / `N x` number in BENCH_NOTES_r{N}.md / SCALING_r{N}.md
that names a JSON artifact must carry a machine-checkable claim annotation
(an HTML comment, invisible in rendered markdown):

    <!-- claim: <artifact.json> <dot.path> <value> [tol=<p>%] -->

e.g.  <!-- claim: bench_r13_rows.json queries_norm.q_text_span_dedup 84.4 tol=1% -->

The checker loads the artifact (first JSON object per line; multi-line
files are parsed whole), resolves the dot path, and compares with relative
tolerance (default 2%). Exit 1 on any mismatch, unresolvable path, or
missing artifact. Round docs >= r13 with ZERO claims also fail.

Round-14 extensions (verdict asks #2 + advice):
  * TABLE-ROW LINTER: in round >= 13 docs, every markdown table row
    (a `|`-prefixed line) containing a seconds/ratio token (`12.3 s`,
    `5.6x`, `2.5(x)` etc.) must carry at least one claim annotation on the
    same line, or an explicit opt-out `<!-- noclaim: <reason> -->` for
    numbers that are dials/bounds rather than measurements. Un-annotated
    measured numbers fail the gate — a table row is not exempt because
    nobody annotated it; that is exactly how the r13 phantoms got through.
  * MALFORMED-CLAIM DETECTOR: any `<!-- claim:` comment that does not
    fully parse is a loud failure, not an invisible skip (one bad claim
    among good ones used to vanish).
  * value regex accepts negative exponents (1e-5) and signed tolerances.

Usage: tools/check_claims.py <round> [docs...]
"""
import json
import re
import sys
from pathlib import Path

FLOAT = r"-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"
CLAIM_RE = re.compile(
    r"<!--\s*claim:\s*(\S+\.json)\s+(\S+)\s+(" + FLOAT + r")"
    r"(?:\s+tol=([0-9.]+)%)?\s*-->")
CLAIM_ANY_RE = re.compile(r"<!--\s*claim:.*?-->", re.S)
NOCLAIM_RE = re.compile(r"<!--\s*noclaim:\s*\S.*?-->", re.S)
# inline code spans are illustrative (`<!-- claim: ... -->` in prose),
# never annotations — strip them before scanning
CODESPAN_RE = re.compile(r"`[^`]*`")
# a measured-looking number in a table cell: "12.3 s", "5.6x", "2.5x/2.3x"
MEASURE_RE = re.compile(r"\b[0-9]+(?:\.[0-9]+)?\s*(?:s\b|x\b|×)")
ROUND_DOC_RE = re.compile(r"(?:SCALING|BENCH_NOTES)_r(\d+)\.md$")


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


def lint_tables(doc: Path) -> int:
    """Round >= 13 docs: measured numbers in table rows need annotations."""
    m = ROUND_DOC_RE.search(doc.name)
    if not m or int(m.group(1)) < 13:
        return 0
    fail = 0
    for lineno, line in enumerate(doc.read_text().splitlines(), 1):
        s = line.strip()
        if not s.startswith("|"):
            continue
        if set(s) <= set("|-: "):
            continue  # separator row
        if not MEASURE_RE.search(CODESPAN_RE.sub("", s)):
            continue
        if CLAIM_ANY_RE.search(s) or NOCLAIM_RE.search(s):
            continue
        print(f"CLAIM FAIL: {doc}:{lineno}: table row cites measured "
              f"numbers with no <!-- claim: ... --> (or "
              f"<!-- noclaim: reason --> for non-measured dials): {s[:120]}",
              file=sys.stderr)
        fail = 1
    return fail


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
        text = doc.read_text()
        # malformed-claim detector: every claim-shaped comment must parse
        for raw in CLAIM_ANY_RE.findall(CODESPAN_RE.sub("", text)):
            if not CLAIM_RE.fullmatch(raw.strip()) and not CLAIM_RE.search(raw):
                print(f"CLAIM FAIL: {doc} has a malformed claim annotation "
                      f"(would be silently skipped): {raw[:120]}",
                      file=sys.stderr)
                fail = 1
        fail |= lint_tables(doc)
        claims = CLAIM_RE.findall(text)
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
