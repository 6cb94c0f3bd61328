#!/usr/bin/env python3
"""Per-query bench regression tripwire.

Compares the per-query seconds maps of two bench captures (the
BENCH_LAST.json shape — {"queries": {name: sec, ...}, ...} — or a bare
{name: sec} map) and flags movers beyond a ratio threshold in either
direction. Round-over-round protocol: at the end of round N copy
BENCH_LAST.json to BENCH_QUERIES_r{N}.json and run

    python3 tools/bench_diff.py BENCH_QUERIES_r{N-1}.json BENCH_QUERIES_r{N}.json

Exit code 0 always (a tripwire, not a gate — in-suite timings drift
±15% with ambient load; see BASELINE.md): the human reads the table.
Sub-threshold noise is summarized, not listed.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d) if isinstance(d, dict) else d
    if not isinstance(q, dict) or not q:
        sys.exit(f"{path}: no per-query map found")
    return {k: float(v) for k, v in q.items()}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            thr = float(a.split("=", 1)[1])
    if len(args) != 2:
        sys.exit("usage: bench_diff.py <old.json> <new.json> [--threshold=1.5]")
    old, new = load(args[0]), load(args[1])
    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    # ignore sub-50ms pairs: ratio of two tiny numbers is all noise
    movers = []
    for q in shared:
        o, n = old[q], new[q]
        if max(o, n) < 0.05:
            continue
        ratio = n / o if o > 0 else float("inf")
        if ratio > thr or ratio < 1 / thr:
            movers.append((ratio, q, o, n))
    movers.sort(reverse=True)

    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}  "
          f"sum {tot_old:.1f}s -> {tot_new:.1f}s ({tot_new / tot_old:.2f}x)")
    if added:
        print(f"new this round ({len(added)}): "
              + ", ".join(f"{q} {new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    if movers:
        print(f"\nmovers beyond {thr}x (either direction):")
        print(f"{'query':<36} {'old s':>8} {'new s':>8} {'ratio':>7}")
        for ratio, q, o, n in movers:
            print(f"{q:<36} {o:>8.2f} {n:>8.2f} {ratio:>6.2f}x")
    else:
        print(f"no movers beyond {thr}x")


if __name__ == "__main__":
    main()
