#!/usr/bin/env bash
# Evidence-chain gate (round-11, verdict asks r9#2 + r10#2): every artifact
# a notes/scaling document cites by name must exist, and the round's
# artifacts must be staged — a snapshot with phantom citations or untracked
# round artifacts is the failure mode this script makes impossible.
#
# Usage: tools/evidence_check.sh <round>     e.g. tools/evidence_check.sh 11
# Exit 0 = clean; exit 1 = violations listed on stderr.
set -uo pipefail
cd "$(dirname "$0")/.."
R=${1:?usage: evidence_check.sh <round>}
fail=0

# (a) stage every round artifact that exists
for f in BENCH_r*.json CORRECTNESS_r*.json BENCH_LOCAL.json LEAKCHECK.json \
         RECALL_r*.json bench_r${R}_*.json BENCH_NOTES_r${R}.md SCALING_r${R}.md \
         STREAM_r*.json BENCH_cluster_r*.json CORRECTNESS_cluster*.json \
         cluster_bitcompare*.json RECALL_sf*.json; do
  [ -e "$f" ] && git add -f "$f"
done

# (b) every backticked *.json/*.md artifact cited in this round's notes must
# exist and be newer than the last source commit (a stale artifact cannot
# witness a fix committed after it was produced)
last_src_commit=$(git log -1 --format=%ct -- src/ build.sbt 2>/dev/null || echo 0)
for doc in BENCH_NOTES_r${R}.md SCALING_r${R}.md; do
  [ -e "$doc" ] || continue
  # backticked file names with artifact extensions; strip paths/anchors
  cites=$(grep -oE '`[A-Za-z0-9_./-]+\.(json|md)`' "$doc" | tr -d '`' | sort -u)
  for c in $cites; do
    base=$(basename "$c")
    # a doc may cite itself or the other round docs
    case "$base" in BENCH_NOTES_r*.md|SCALING_r*.md|BASELINE.md|SURVEY.md|CLUSTER.md|VERDICT.md|ADVICE.md|README.md|TESTDATA.md|PAPERS.md|SNIPPETS.md|FIXTURES.md) continue;; esac
    if [ ! -e "$c" ] && [ ! -e "$base" ]; then
      echo "EVIDENCE FAIL: $doc cites '$c' which does not exist" >&2
      fail=1
      continue
    fi
    tgt="$c"; [ -e "$tgt" ] || tgt="$base"
    mt=$(stat -c %Y "$tgt")
    # artifacts produced BEFORE the round's last source commit cannot
    # witness it — unless the doc explicitly declares provenance:
    #  - "(frontier: r<N>)"  — prior-round frontier data, kept as-is
    #  - "(baseline: ...)"   — a prior-round artifact cited only as a
    #                          comparison denominator, never as a witness
    #  - "(witness: <sha>)"  — produced on the named commit; the gate
    #                          VERIFIES the artifact is newer than that
    #                          commit, so the tag pins a checkable floor
    #                          instead of waiving the check
    if [ "$mt" -lt "$last_src_commit" ]; then
      # a citation may be path-qualified inside the backticks — match the
      # basename anywhere within a backticked token
      tagline=$(grep -E "\`([A-Za-z0-9_./-]*/)?$base\`" "$doc" 2>/dev/null)
      if echo "$tagline" | grep -qE "frontier:|baseline:"; then
        :
      elif echo "$tagline" | grep -qoE "witness: [0-9a-f]{7,40}"; then
        wsha=$(echo "$tagline" | grep -oE "witness: [0-9a-f]{7,40}" | head -1 | awk '{print $2}')
        wct=$(git log -1 --format=%ct "$wsha" 2>/dev/null || echo "")
        if [ -z "$wct" ]; then
          echo "EVIDENCE FAIL: $doc tags '$c' with unknown witness commit $wsha" >&2
          fail=1
        elif [ "$mt" -lt "$wct" ]; then
          echo "EVIDENCE FAIL: $doc tags '$c' (witness: $wsha) but the artifact predates that commit" >&2
          fail=1
        fi
      else
        echo "EVIDENCE FAIL: $doc cites '$c' older than the last source commit (stale witness)" >&2
        fail=1
      fi
    fi
    git add -f "$tgt" 2>/dev/null || true
  done
done

# (b2) cited NUMBERS must match the artifacts they cite (round-12 ask #4:
# the 588.9-vs-473.6 and 161.8-vs-84.4 drifts) — every headline number in
# the round docs carries a <!-- claim: artifact path value --> annotation
# that tools/check_claims.py verifies against the artifact's actual field
if ! python3 tools/check_claims.py "$R" >&2; then
  fail=1
fi

# (c) nothing tracked may be modified-unstaged at snapshot time
dirty=$(git status --porcelain | grep -E '^.M' || true)
if [ -n "$dirty" ]; then
  echo "EVIDENCE FAIL: modified-unstaged files at snapshot:" >&2
  echo "$dirty" >&2
  fail=1
fi

if [ $fail -eq 0 ]; then echo "EVIDENCE OK (round $R)"; fi
exit $fail
