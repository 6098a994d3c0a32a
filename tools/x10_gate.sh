#!/usr/bin/env bash
# ×10 synthesized-corpus correctness spot-gate (VERDICT r11 item 6; standing
# since r13, artifact-emitting + gate.sh-wired since r14).
#
# Plain ×10 replication of the sf0.1 documents table (SynthCorpus — shared
# vocabulary, so every corpus-level count really grows ×10) + the DuckDB
# oracle re-run for the frequency/threshold-sensitive documents-only subset.
# Catches the fixed-threshold / overflow class of bug that sf0.1 cannot (the
# d81 df>=5 incident: stripped 99.8% of tokens at 5000 docs). Expensive
# algorithm-mirror oracles (d52/d53/d54/t49/t58: quadratic or unrolled
# k-means/BPE SQL) are excluded — their scale story is ScaleProbe's, not a
# DuckDB rerun's. Expect "N pass, 0 fail".
#
# Emits $ARTIFACT (default X10_CORRECTNESS.json in the repo root) from the
# check.py output and exits NONZERO on any fail — gate.sh runs this every
# round (r13 VERDICT item 3: the artifact must regenerate with the query
# list, never go stale by hand).
set -uo pipefail
cd "$(dirname "$0")/.."

BASE=${BASE:-/root/testdata/sf0.1}
X10=${X10:-/tmp/graft_x10}
OUT=${OUT:-/tmp/graft_x10_verify}
ARTIFACT=${ARTIFACT:-X10_CORRECTNESS.json}
# default round = newest driver correctness artifact + 1 (the round being
# built) — removes the every-round manual bump this line used to need
ROUND=${ROUND:-$(ls CORRECTNESS_r*.json 2>/dev/null \
  | sed 's/.*_r0*\([0-9]*\)\.json/\1/' | sort -n | tail -1 \
  | awk '{print $1 + 1}')}
ROUND=${ROUND:-1}

# frequency-threshold ops (d81 df, t55/t56 vocab min-counts, u65 heavy-hitter
# survival, d71 window counts, t60 mixture normalizer, d86 prefix anchors,
# t73 rarity weights = 1e9 DIV df with df growing x10, t74 PMI count floors),
# dedup/report/sampling over the duplicated corpus, and scoring gates
QUERIES=t74,d50,d55,d63,d66,d71,d74,d81,d86,d87,d90,t46,t47,t50,t52,t55,t56,t57,t60,t61,t65,t68,t73,u65

if [ ! -d "$X10/documents.parquet" ]; then
  echo "== synthesizing plain x10 corpus =="
  sbt -batch "runMain graft.tools.SynthCorpus 10 $BASE $X10" 2>&1 | grep "\[synth\]"
fi
echo "== verify x10 subset =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $X10 $OUT $QUERIES" 2>&1 | grep "\[verify\]" || true
echo "== duckdb oracle compare at x10 =="
CHECK_OUT=$(python3 tools/check.py "$X10" "$OUT" 2>/dev/null)
echo "$CHECK_OUT" | grep -E "FAIL|=="

# artifact: parse "PASS name: rows=N" / "FAIL name: ..." lines into the
# committed per-round JSON (queries sorted; summary line verbatim)
CHECK_TXT=$(mktemp)
echo "$CHECK_OUT" > "$CHECK_TXT"
python3 - "$ARTIFACT" "$ROUND" "$QUERIES" "$CHECK_TXT" <<'EOF'
import json, re, sys
artifact, rnd, wanted = sys.argv[1], int(sys.argv[2]), sys.argv[3].split(",")
text = open(sys.argv[4]).read()
queries, summary = {}, ""
for line in text.splitlines():
    m = re.match(r"(PASS|FAIL|SKIP) (\w+):(?: rows=(\d+))?", line)
    if m:
        status = {"PASS": "pass", "FAIL": "fail", "SKIP": "no_oracle"}[m.group(1)]
        queries[m.group(2)] = {"status": status,
                               **({"rows": int(m.group(3))} if m.group(3) else {})}
    if line.startswith("=="):
        summary = line.strip("= ").strip()
missing = [q for q in wanted if q not in queries]
doc = {"gate": "x10_plain_documents", "base": "sf0.1", "factor": 10,
       "round": rnd, "summary": summary,
       **({"missing_from_run": missing} if missing else {}),
       "queries": {k: queries[k] for k in sorted(queries)}}
json.dump(doc, open(artifact, "w"), indent=1)
print(f"[x10] artifact -> {artifact} ({summary}"
      + (f"; MISSING: {missing}" if missing else "") + ")")
m = re.search(r"(\d+) fail", summary)
n_fail = int(m.group(1)) if m else 99  # unparseable summary = failure
sys.exit(1 if n_fail or missing else 0)
EOF
