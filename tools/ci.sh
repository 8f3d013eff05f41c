#!/usr/bin/env bash
# Full local gate, in the order failures are cheapest to catch:
# compile → tests → sf0.001 verify+oracle+golden → sf0.01 verify+oracle.
# Usage: bash tools/ci.sh [--fast]   (--fast skips the sf0.01 pass)
set -euo pipefail
cd "$(dirname "$0")/.."

# Pin parallelism: q13/q63 sketch goldens depend on partition count, so an
# inherited SPARK_GRAFT_CPUS would make golden check drift across hosts.
export SPARK_GRAFT_CPUS=4

sbt compile
sbt test

sbt "runMain graft.Verify /root/testdata/sf0.001 /tmp/ci_v0"
python3 tools/check.py /root/testdata/sf0.001 /tmp/ci_v0
python3 tools/golden.py check /tmp/ci_v0

if [[ "${1:-}" != "--fast" ]]; then
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/ci_v1"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/ci_v1
fi
echo "CI GREEN"
