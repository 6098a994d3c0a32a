#!/usr/bin/env bash
# ×10 synthesized-corpus correctness spot-gate (VERDICT r11 item 6).
#
# Plain ×10 replication of the sf0.1 documents table (SynthCorpus — shared
# vocabulary, so every corpus-level count really grows ×10) + the DuckDB
# oracle re-run for the frequency/threshold-sensitive documents-only subset.
# Catches the fixed-threshold / overflow class of bug that sf0.1 cannot (the
# d81 df>=5 incident: stripped 99.8% of tokens at 5000 docs). Expensive
# algorithm-mirror oracles (d52/d53/d54/t49/t58: quadratic or unrolled
# k-means/BPE SQL) are excluded — their scale story is ScaleProbe's, not a
# DuckDB rerun's. Expect "N pass, 0 fail".
set -uo pipefail
cd "$(dirname "$0")/.."

BASE=${BASE:-/root/testdata/sf0.1}
X10=${X10:-/tmp/graft_x10}
OUT=${OUT:-/tmp/graft_x10_verify}

# frequency-threshold ops (d81 df, t55/t56 vocab min-counts, u65 heavy-hitter
# survival, d71 window counts, t60 mixture normalizer, d86 prefix anchors,
# t73 rarity weights = 1e9 DIV df with df growing x10),
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
python3 tools/check.py "$X10" "$OUT" 2>/dev/null | grep -E "FAIL|=="
