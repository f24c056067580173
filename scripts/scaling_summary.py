#!/usr/bin/env python3
"""Summarize BENCH_scaling.json (dev tool; no JVM).

Prints every er_scaling run grouped by (pages, cores) with docs/sec,
then the N->4N scaling efficiency for each (lo, hi) core pair at the
largest page count: eff = (hi_docs_per_sec / lo_docs_per_sec) / (hi/lo).

Usage: python3 scripts/scaling_summary.py [BENCH_scaling.json]
       python3 scripts/scaling_summary.py --pair <hi_line> <lo_line>
The --pair form computes one efficiency from two explicit 1-based line
numbers (for quoting a specific quiet pair rather than level means).
"""
import json
import sys


def load(path):
    runs = []
    with open(path) as f:
        for i, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if r.get("bench") == "er_scaling":
                r["_line"] = i
                runs.append(r)
    return runs


def main(argv):
    if argv[:1] == ["--pair"]:
        hi_ln, lo_ln = int(argv[1]), int(argv[2])
        runs = {r["_line"]: r for r in load(argv[3] if len(argv) > 3
                                            else "BENCH_scaling.json")}
        hi, lo = runs[hi_ln], runs[lo_ln]
        ratio = hi["cores"] / lo["cores"]
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
        print(f"pair lines {hi_ln}/{lo_ln}: {hi['cores']}c "
              f"{hi['docs_per_sec']:.1f} vs {lo['cores']}c "
              f"{lo['docs_per_sec']:.1f} docs/s -> efficiency {eff:.3f}")
        return 0

    path = argv[0] if argv else "BENCH_scaling.json"
    runs = load(path)
    by_level = {}
    for r in runs:
        by_level.setdefault((r["pages"], r["cores"]), []).append(r)
    for (pages, cores), rs in sorted(by_level.items()):
        vals = [x["docs_per_sec"] for x in rs]
        lines = ",".join(str(x["_line"]) for x in rs)
        print(f"pages={pages:>8} cores={cores:>2} runs={len(rs)} "
              f"docs/s={'/'.join(f'{v:.1f}' for v in vals)} "
              f"mean={sum(vals)/len(vals):.1f} (lines {lines})")
    pages_max = max(r["pages"] for r in runs)
    levels = sorted({r["cores"] for r in runs if r["pages"] == pages_max})
    for lo in levels:
        for hi in levels:
            if hi == 4 * lo:
                lo_m = [r["docs_per_sec"] for r in runs
                        if r["pages"] == pages_max and r["cores"] == lo]
                hi_m = [r["docs_per_sec"] for r in runs
                        if r["pages"] == pages_max and r["cores"] == hi]
                lo_v = sum(lo_m) / len(lo_m)
                hi_v = sum(hi_m) / len(hi_m)
                eff = (hi_v / lo_v) / 4
                print(f"{pages_max} pages {lo}->{hi} cores: level-mean "
                      f"efficiency {eff:.3f} ({hi_v:.1f} vs {lo_v:.1f})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
