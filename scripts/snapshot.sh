#!/usr/bin/env bash
# End-of-round snapshot ritual — run BEFORE the final commit of a round.
#
# Round 2 was zeroed because the snapshot commit contained a file that did
# not compile: the driver's bench got rc=1 and CORRECTNESS_r02.json came
# back `{}` even though every query was green an hour earlier. The floor
# for ANY commit that might be the round's last is: compiles, full test
# suite green, full sf0.001 gate green. This script is that floor; it
# exits non-zero on the first failure so `./scripts/snapshot.sh && git
# commit ...` cannot snapshot a broken tree.
#
# sf0.001 (not sf0.01) keeps the loop ~2 min; run the sf0.01 gate at least
# once per batch of operator work as usual (scripts/check.py sf0.01).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== snapshot gate: compile + full test suite (one sbt launch) ==="
sbt -batch test

echo "=== snapshot gate: correctness @ sf0.001 ==="
python3 scripts/check.py /root/testdata/sf0.001

echo "=== snapshot gate: ALL GREEN — safe to commit ==="
