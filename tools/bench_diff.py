#!/usr/bin/env python3
"""Per-query bench regression pin — the bench twin of PlansDriftSpec.

Until round 17 the recorded-tail comparison between rounds was manual
prose in SCALE.md; a >2x per-query regression could ship unnoticed if
nobody eyeballed the right line. This check diffs two bench result
files per query and fails loudly on large movers.

Usage:
    python3 tools/bench_diff.py <old> <new> [--allow q1,q2] [--ratio R]
    python3 tools/bench_diff.py --selftest

Each input file may be:
  - a driver round artifact BENCH_r{N}.json  ({"parsed": {..., "queries": {...}}})
  - a raw `graft.Bench` output capture (the LAST line holding the JSON
    {"metric": "total", ..., "queries": {...}})
  - a plain JSON object with a "queries" map.

A query is FLAGGED when it appears in both maps and
    new > RATIO * old   AND   new - old > FLOOR_SECONDS
(the absolute floor keeps sub-noise jitter on cheap queries from
flagging; this box shows ~50% spikes on <0.5 s queries). Queries named
in --allow are reported but do not fail the check — the allowlist is
for KNOWN, explained movers (a deliberately heavier declared form, a
substrate reassignment), mirroring PlansDriftSpec's regenerate-on-
intent discipline. Total drift beyond RATIO also fails.

Exit codes: 0 clean, 1 regressions flagged, 2 input error.
"""
import json
import sys

RATIO = 2.0
FLOOR_SECONDS = 0.4


def load_queries(path: str) -> dict:
    """Extract {query: seconds} (+ '_total') from any supported shape."""
    text = open(path).read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        # raw Bench capture: last line carrying a JSON object
        doc = None
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    doc = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        if doc is None:
            raise ValueError(f"{path}: no JSON object found")
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    if "queries" not in doc:
        raise ValueError(f"{path}: no 'queries' map")
    out = {str(k): float(v) for k, v in doc["queries"].items()}
    if "value" in doc:
        out["_total"] = float(doc["value"])
    return out


def diff(old: dict, new: dict, allow: set,
         ratio: float = RATIO, floor: float = FLOOR_SECONDS):
    """Returns (failures, allowed_movers, notes) — each a list of strings."""
    failures, allowed, notes = [], [], []
    common = sorted((set(old) & set(new)) - {"_total"})
    for q in common:
        o, n = old[q], new[q]
        if n > ratio * o and n - o > floor:
            line = f"{q}: {o:.3f}s -> {n:.3f}s ({n / o:.1f}x, +{n - o:.2f}s)"
            (allowed if q in allow else failures).append(line)
    if "_total" in old and "_total" in new and new["_total"] > ratio * old["_total"]:
        failures.append(
            f"TOTAL: {old['_total']:.1f}s -> {new['_total']:.1f}s (> {ratio}x)")
    gone = sorted(set(old) - set(new) - {"_total"})
    fresh = sorted(set(new) - set(old) - {"_total"})
    if gone:
        notes.append(f"dropped from recording ({len(gone)}): {', '.join(gone[:10])}")
    if fresh:
        notes.append(f"new in recording ({len(fresh)}): {', '.join(fresh[:10])}")
    notes.append(f"compared {len(common)} common queries")
    return failures, allowed, notes


def _selftest() -> None:
    old = {"a": 1.0, "b": 0.1, "c": 0.5, "d": 2.0, "_total": 10.0}
    # a: seeded 3x + 2s regression -> must flag
    # b: 3x but only +0.2s (under floor: cheap-query jitter) -> clean
    # c: +0.45s but only 1.9x (under ratio) -> clean
    new = {"a": 3.0, "b": 0.3, "c": 0.95, "d": 2.0, "e": 0.5, "_total": 12.0}
    fails, allowed, _ = diff(old, new, allow=set())
    assert len(fails) == 1 and fails[0].startswith("a:"), fails
    assert not allowed
    # the allowlist converts the same mover into a non-failure
    fails2, allowed2, _ = diff(old, new, allow={"a"})
    assert not fails2 and len(allowed2) == 1, (fails2, allowed2)
    # total-ratio trip
    fails3, _, _ = diff({"_total": 10.0}, {"_total": 21.0}, allow=set())
    assert fails3 and fails3[0].startswith("TOTAL"), fails3
    # shape handling: driver artifact nesting
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump({"n": 1, "parsed": {"value": 5.0, "queries": {"x": 1.0}}}, f)
        p = f.name
    assert load_queries(p) == {"x": 1.0, "_total": 5.0}
    os.unlink(p)


def main(argv) -> int:
    if "--selftest" in argv:
        _selftest()
        print("bench_diff selftest OK")
        return 0
    args = [a for a in argv if not a.startswith("--")]
    allow = set()
    ratio = RATIO
    for a in argv:
        if a.startswith("--allow="):
            allow = {s for s in a.split("=", 1)[1].split(",") if s}
        if a.startswith("--ratio="):
            ratio = float(a.split("=", 1)[1])
    if len(args) != 2:
        print(__doc__)
        return 2
    try:
        old, new = load_queries(args[0]), load_queries(args[1])
    except (OSError, ValueError) as e:
        print(f"bench_diff: {e}")
        return 2
    failures, allowed, notes = diff(old, new, allow, ratio)
    for n in notes:
        print(f"  ({n})")
    for a in allowed:
        print(f"ALLOWED {a}")
    for f in failures:
        print(f"REGRESSION {f}")
    if failures:
        print(f"\n{len(failures)} bench regression(s) > {ratio}x — re-run "
              "Bench first (box noise spikes ~50% on cheap queries); if real, "
              "root-cause or add to --allow with the explanation in SCALE.md")
        return 1
    print("bench diff clean")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
