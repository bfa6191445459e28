#!/usr/bin/env python3
"""Compare the 10x (tmp/sf1) bench pass against an sf0.1 pass and
print the per-query scaling ratio table for SURVEY (round-5 item 6).

Usage: python3 tools/sf1_compare.py BENCH_r05_sf1.json BENCH_r05_local.json [threshold]

A ratio near 10 is linear scaling at 10x data; > 3x-superlinear means
ratio > 30. Short queries are noise-dominated, so rows with an sf0.1
time under 0.3 s are flagged but ranked by absolute sf1 time.
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    if "queries" not in d and "tail" in d:  # driver wrapper
        d = json.loads(d["tail"][d["tail"].index('{"metric"'):])
    return d


def main():
    sf1 = load(sys.argv[1])
    base = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    rows = []
    for q, t1 in sf1["queries"].items():
        t0 = base["queries"].get(q)
        if t0 is None:
            rows.append((q, t0, t1, None))
        else:
            rows.append((q, t0, t1, t1 / t0))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"sf1 total {sf1['value']:.1f}s over {len(sf1['queries'])} queries; "
          f"sf0.1 total {base['value']:.1f}s; failed={sf1.get('failed')}")
    print(f"\n| query | sf0.1 s | sf1 s | ratio (10 = linear) |")
    print("| --- | --- | --- | --- |")
    for q, t0, t1, r in rows:
        if r is not None and (r > thr or (t1 > 30 and r > 15)):
            note = " (noise-dominated base)" if t0 < 0.3 else ""
            print(f"| {q} | {t0:.2f} | {t1:.2f} | {r:.1f}x{note} |")
    lin = [r for _, t0, _, r in rows if r is not None and t0 >= 0.3]
    if lin:
        lin.sort()
        print(f"\nmedian ratio (bases >= 0.3s): {lin[len(lin)//2]:.1f} "
              f"(10 = perfectly linear)")


if __name__ == "__main__":
    main()
