#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (same tree, different host conditions):
for every shared query, print the B/A ratio of the RAW median and of the
PER-PASS-CALIBRATED median, plus the spread of each ratio series. A
noise-immune estimator should hold its ratios near 1.0 when only host load
changed between the runs.

Usage: python3 scripts/bench_ab_compare.py A.json B.json
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    shared = sorted(set(a["queries"]) & set(b["queries"]))
    series = [("raw", "queries"), ("quiet", "queries_quiet"),
              ("cal", "queries_cal")]
    ratios = {label: [] for label, _ in series}
    print(f"{'query':34s}" + "".join(f" {label + ' B/A':>10s}"
                                     for label, _ in series))
    for q in shared:
        row = f"{q:34s}"
        for label, key in series:
            if q in a.get(key, {}) and q in b.get(key, {}):
                r = b[key][q] / a[key][q]
                ratios[label].append(r)
                row += f" {r:10.3f}"
            else:
                row += f" {'-':>10s}"
        print(row)

    def spread(xs):
        gm = statistics.geometric_mean(xs)
        mad = statistics.median(abs(x - 1.0) for x in xs)
        return gm, mad, min(xs), max(xs)

    for label, _ in series:
        if ratios[label]:
            gm, mad, lo, hi = spread(ratios[label])
            print(f"{label}: geomean={gm:.3f} median|r-1|={mad:.3f} "
                  f"range=[{lo:.3f}, {hi:.3f}]")


if __name__ == "__main__":
    main()
