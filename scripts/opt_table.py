#!/usr/bin/env python3
"""Render the round-6 per-query before/after table (dev tool).

Usage: python3 scripts/opt_table.py <before.json> <after.json>
Inputs are BenchExtra `count`-mode JSON lines (min-of-N per query).
"""
import json
import sys


def main(before_path, after_path):
    a = json.load(open(before_path))["queries"]
    b = json.load(open(after_path))["queries"]
    rows = sorted(a, key=lambda q: -a[q])
    print("| query | before s | after s | delta |")
    print("|---|---|---|---|")
    for q in rows:
        if q not in b:
            continue
        d = b[q] - a[q]
        mark = "" if abs(d) < 0.08 else (" **" + f"{d:+.2f}" + "**")
        print(f"| {q} | {a[q]:.2f} | {b[q]:.2f} | {d:+.2f}{mark} |")
    print(f"| TOTAL | {sum(a.values()):.2f} | "
          f"{sum(b[q] for q in a if q in b):.2f} | |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
