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


def is_subset(path):
    """True when the artifact self-declares a SPARK_GRAFT_BENCH_ONLY
    filter (r13 Bench stamps "only":[...]) — its "total" is a subset
    sum and it must not stand in for a full run."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return bool(d.get("only") or (d.get("parsed") or {}).get("only"))


def resolve(path):
    """A directory resolves to its newest FULL-RUN bench_full* artifact
    (the append-only artifacts Bench writes since r12 — including the
    refuse-to-overwrite fallback names). Subset artifacts (ADVICE r12:
    a later 1-query A/B receipt silently shadowed the full run) are
    skipped with a note. mtime ties (e.g. two committed artifacts
    checked out together) break lexicographically, so the later-named
    artifact wins deterministically."""
    import glob
    import os
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "bench_full*")),
                       key=lambda p: (os.path.getmtime(p), p))
        skipped = [c for c in cands if is_subset(c)]
        cands = [c for c in cands if c not in skipped]
        for c in skipped:
            print(f"# note: skipping subset artifact {c} "
                  f"(self-declares an \"only\" filter)")
        if not cands:
            print(f"# ERROR: no full-run bench_full* artifact under {path}")
            sys.exit(2)
        return cands[-1]
    return path


def load_queries(path):
    """(queries: {name: sec}, partial: bool, dirty: list|None)"""
    with open(path) as f:
        d = json.load(f)
    # r12 Bench stamps dirty/dirty_queries when accepted minima came out
    # of over-gate load windows - surface it, the artifact is suspect
    dirty = d.get("dirty_queries") if d.get("dirty") else None
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: v for k, v in d["queries"].items() if v >= 0}, False, dirty
    if d.get("parsed") and isinstance(d["parsed"].get("queries"), dict):
        p = d["parsed"]
        dirty = p.get("dirty_queries") if p.get("dirty") else dirty
        return {k: v for k, v in p["queries"].items() if v >= 0}, False, dirty
    tail = d.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
    qs = {k: float(v) for k, v in pairs
          if k not in ("value", "load", "load_end")}
    return qs, True, dirty


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    old_path, new_path = resolve(args[0]), resolve(args[1])
    for side, p in (("OLD", old_path), ("NEW", new_path)):
        if is_subset(p):
            print(f"# WARNING: {side} ({p}) is a SUBSET artifact - its "
                  f"totals cover only its \"only\" filter")
    old, old_partial, old_dirty = load_queries(old_path)
    new, new_partial, new_dirty = load_queries(new_path)
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
    if old_dirty is not None:
        print(f"# WARNING: OLD self-declares DIRTY - {len(old_dirty)} "
              f"accepted minima saw over-gate load: {', '.join(old_dirty)}")
    if new_dirty is not None:
        print(f"# WARNING: NEW self-declares DIRTY - {len(new_dirty)} "
              f"accepted minima saw over-gate load: {', '.join(new_dirty)}")
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
