#!/usr/bin/env bash
# Full local gate: tests + oracle correctness (BOTH SFs) + bench (sf0.1)
# + same-session DuckDB ratio. Pass QUICK=1 to skip sf0.1 verify + bench.
set -uo pipefail
cd "$(dirname "$0")/.."
echo "== tests =="
sbt -batch test 2>&1 | grep -E "Tests:|Passed:|FAILED"
echo "== verify sf0.01 =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_verify" 2>&1 | grep "\[verify\]" || true
python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_verify 2>/dev/null | grep -E "FAIL|=="
if [ "${QUICK:-0}" = "1" ]; then exit 0; fi
echo "== verify sf0.1 =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/gate_verify1" 2>&1 | grep "\[verify\]" || true
python3 tools/check.py /root/testdata/sf0.1 /tmp/gate_verify1 2>/dev/null | grep -E "FAIL|=="
echo "== scale gate (1x vs 10x growth classes; VERDICT r11 item 5) =="
SCALE_QUERIES=d71,d82,d83,s61,s76,s78_probe,s79_probe,s80_probe,t73,s84 \
SCALE_FACTORS=1,10 \
  sbt -batch "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 /tmp/graft_scale" 2>&1 \
  | grep "\[scale\]" | tee /tmp/scale_gate.txt || true
python3 tools/scale_gate.py /tmp/scale_gate.txt
echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
echo "== duckdb baseline (same session) =="
python3 tools/bench_duck.py /root/testdata/sf0.1 /tmp/gate_verify1 2 2>/dev/null | tail -1
