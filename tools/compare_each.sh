#!/bin/bash
# Per-query oracle compare with a wall timeout — for long sweeps (sf1)
# where a few deliberately-quadratic all-pairs ORACLE formulations cost
# hours in DuckDB. Each query runs in its own process under `timeout`;
# a timed-out oracle prints "TIMEOUT <name>" and the sweep continues.
#
# Recursive-CC oracles (knn_components / knn_cluster_purity) are handled
# automatically by compare.py's union-find fallback: when the declarative
# reach table would exceed COMPARE_UF_BUDGET rows (sum |component|^2 —
# 1.6e9 at sf2's single 40k-node component), the gate computes the SAME
# min-label components by exact union-find over the oracle's own
# non-recursive edge prefix and splices them into the verbatim tail.
# No manual steps at any sf; tune with COMPARE_UF_BUDGET /
# COMPARE_UF_MIN_NODES (see SCALE.md round-14 for the hand-proven method).
#
# Usage: tools/compare_each.sh <sfDir> <verifyOutDir> <timeoutSecs> <name>...
set -u
SF=$1; OUT=$2; T=$3; shift 3
for name in "$@"; do
  COMPARE_ONLY=$name timeout "$T" python3 "$(dirname "$0")/compare.py" "$SF" "$OUT" 2>&1 \
    | grep -E "^(PASS|FAIL)" || echo "TIMEOUT $name (${T}s)"
done
