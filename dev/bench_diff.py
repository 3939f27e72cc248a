#!/usr/bin/env python3
"""Round-over-round bench diff FROM DRIVER ARTIFACTS (VERDICT r10 #1 /
Next #4): COVERAGE's regression claims must reproduce from committed
artifacts alone, not from a hand-picked quiet local sweep.

Usage: dev/bench_diff.py OLD NEW [--threshold 1.25]

OLD/NEW are bench artifacts in any of the shapes the repo carries:
  - bench_full.json           (the complete one-line sidecar)
  - BENCH_r*.json with a non-null "parsed" field
  - BENCH_r*.json with only a truncated "tail" (partial recovery via
    regex over the tail; recovered queries are marked PARTIAL so a
    claim built on them is visibly weaker)

Prints the shared-query table sorted by ratio desc, the >threshold
regressions, and the shared-total ratio. Exit code 0 always — this is
a reporting tool; gates live in the bench/test mains.
"""
import json
import re
import sys


def load_queries(path):
    """(queries: {name: sec}, partial: bool)"""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: v for k, v in d["queries"].items() if v >= 0}, False
    if d.get("parsed") and isinstance(d["parsed"].get("queries"), dict):
        return {k: v for k, v in d["parsed"]["queries"].items() if v >= 0}, False
    tail = d.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
    qs = {k: float(v) for k, v in pairs
          if k not in ("value", "load", "load_end")}
    return qs, True


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old, old_partial = load_queries(args[0])
    new, new_partial = load_queries(args[1])
    shared = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    rows = [(q, old[q], new[q], new[q] / old[q] if old[q] > 0 else float("inf"))
            for q in shared]
    rows.sort(key=lambda r: -r[3])
    print(f"# bench diff: {args[0]} -> {args[1]}")
    if old_partial:
        print(f"# WARNING: OLD recovered from a truncated tail - "
              f"{len(old)} queries visible, not the full run (PARTIAL)")
    if new_partial:
        print(f"# WARNING: NEW recovered from a truncated tail - "
              f"{len(new)} queries visible, not the full run (PARTIAL)")
    print(f"# shared {len(shared)}  only-old {len(only_old)}  "
          f"only-new {len(only_new)}")
    if only_new:
        print(f"# new queries: {', '.join(only_new)}")
    if only_old:
        print(f"# dropped queries: {', '.join(only_old)}")
    print(f"{'query':28s} {'old_s':>8s} {'new_s':>8s} {'ratio':>6s}")
    for q, o, n, r in rows:
        flag = "  <-- REGRESSION" if r > thr else ""
        print(f"{q:28s} {o:8.3f} {n:8.3f} {r:6.2f}{flag}")
    to, tn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    reg = [q for q, _, _, r in rows if r > thr]
    print(f"# shared-total {to:.1f}s -> {tn:.1f}s "
          f"(ratio {tn / to:.2f}) | regressions >{thr}x: "
          f"{len(reg)} {reg if reg else ''}")


if __name__ == "__main__":
    main()
