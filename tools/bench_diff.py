#!/usr/bin/env python
"""Diff two BENCH_FULL.json sweeps and flag per-query regressions.

Usage:
    python tools/bench_diff.py BENCH_FULL_r04.json BENCH_FULL.json \
        [--threshold 1.5] [--min-sec 0.5]

Prints entries whose time grew by more than ``threshold``× AND whose
new time exceeds ``min-sec`` (sub-second jitter on a throttled host is
not a regression — see NOTES_r3/r4: the same sweep varies 2-3× with
load, so only compare idle-host runs). Exit 1 if any flagged.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    args = ap.parse_args()
    old = json.load(open(args.old))["queries"]
    new = json.load(open(args.new))["queries"]

    flagged = []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            print(f"  new entry: {name} {t_new:.2f}s")
            continue
        if t_new > args.min_sec and t_new > args.threshold * t_old:
            flagged.append((name, t_old, t_new))
    gone = sorted(set(old) - set(new))
    for name in gone:
        print(f"  removed entry: {name}")
    if flagged:
        print(f"\n{len(flagged)} regressions (> {args.threshold}x, "
              f"> {args.min_sec}s):")
        for name, t_old, t_new in sorted(flagged, key=lambda x: -x[2] / x[1]):
            print(f"  {name}: {t_old:.2f}s -> {t_new:.2f}s "
                  f"({t_new / t_old:.1f}x)")
        return 1
    print("no regressions flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
