#!/bin/bash
# Per-query oracle compare with a wall timeout — for long sweeps (sf1)
# where a few deliberately-quadratic all-pairs ORACLE formulations cost
# hours in DuckDB. Each query runs in its own process under `timeout`;
# a timed-out oracle prints "TIMEOUT <name>" and the sweep continues.
#
# Usage: tools/compare_each.sh <sfDir> <verifyOutDir> <timeoutSecs> <name>...
set -u
SF=$1; OUT=$2; T=$3; shift 3
for name in "$@"; do
  COMPARE_ONLY=$name timeout "$T" python3 "$(dirname "$0")/compare.py" "$SF" "$OUT" 2>&1 \
    | grep -E "^(PASS|FAIL)" || echo "TIMEOUT $name (${T}s)"
done
