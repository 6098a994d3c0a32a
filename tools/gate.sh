#!/usr/bin/env bash
# Full local gate: tests + oracle correctness (sf0.01) + bench (sf0.1).
set -uo pipefail
cd "$(dirname "$0")/.."
echo "== tests =="
sbt -batch test 2>&1 | grep -E "Tests:|Passed:|FAILED"
echo "== verify sf0.01 =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_verify" 2>&1 | grep "\[verify\]" || true
python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_verify 2>/dev/null | grep -E "FAIL|=="
echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"'
