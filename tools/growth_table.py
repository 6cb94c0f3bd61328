#!/usr/bin/env python3
"""Render the sf0.1 / sf1 / sf10 warm-min-of-3 growth table from the
per-family bench JSONs the scale-evidence marathon writes to /tmp/ev.

Usage: python3 tools/growth_table.py /tmp/ev
Prints a markdown table: query | sf0.1 | sf1 | sf10 | sf0.1->sf1 (10x) |
sf1->sf10 (10x), flagging growth > 12x per decade with '**'.
"""
import json
import sys
from pathlib import Path


def main() -> None:
    evdir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ev")
    scales = ["sf0.1", "sf1", "sf10"]
    per_scale: dict[str, dict[str, float]] = {s: {} for s in scales}
    for f in sorted(evdir.glob("*.json")):
        scale = f.name.split("_")[0]
        if scale not in per_scale:
            continue
        data = json.loads(f.read_text())
        # later files (e.g. the SUBSTRB re-run batch) override earlier
        # entries for the same query: re-runs are the cleaner numbers
        per_scale[scale].update(data.get("queries", {}))
        if data.get("failed"):
            print(f"<!-- WARNING {f.name} failed: {data['failed']} -->")
    queries = sorted(set().union(*[set(m) for m in per_scale.values()]))
    print("| query | sf0.1 | sf1 | sf10 | ×@sf1 | ×@sf10 |")
    print("|---|---|---|---|---|---|")
    for q in queries:
        cells = []
        vals = []
        for s in scales:
            v = per_scale[s].get(q)
            vals.append(v)
            cells.append(f"{v:.2f} s" if v is not None else "—")
        for lo, hi in ((0, 1), (1, 2)):
            if vals[lo] and vals[hi]:
                g = vals[hi] / vals[lo]
                mark = "**" if g > 12 else ""
                cells.append(f"{mark}{g:.1f}×{mark}")
            else:
                cells.append("—")
        print(f"| {q} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
