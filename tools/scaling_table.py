#!/usr/bin/env python3
"""Emit the per-query sf0.1 / sf1 / sf10 scaling table (VERDICT r5 item 1).

Usage: python3 tools/scaling_table.py BENCH_FULL.json BENCH_SF1_FULL.json \
           BENCH_SF10_FULL.json

Reads the three full bench artifacts (each written by graft.Bench), joins
per-query minima (min is the contention-free number; medians are also
shown for the multi-rep sf0.1 artifact), and prints a markdown table with
the 1→10 and 10→100 wall-time ratios. Data grows 10× per step, so a ratio
above 10 is super-linear — those rows get flagged and must either be fixed
or carry a documented reason in PERF.md.

Streaming (st-family) entries are ratio-exempt by construction: their wall
time is dominated by the micro-batch scheduling floor, not data volume
(exec seconds are reported separately by Bench).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # full artifacts carry queries_min / queries_max; the headline 'queries'
    # map is the median
    return d


def main():
    p01, p1, p10 = sys.argv[1], sys.argv[2], sys.argv[3]
    a, b, c = load(p01), load(p1), load(p10)
    qa, qb, qc = a["queries_min"], b["queries_min"], c["queries_min"]
    keys = sorted(set(qa) | set(qb) | set(qc))
    print("| query | sf0.1 min s | sf1 min s | sf10 min s | sf1/sf0.1 | sf10/sf1 | flag |")
    print("|---|---|---|---|---|---|---|")
    flagged = []
    for k in keys:
        va, vb, vc = qa.get(k), qb.get(k), qc.get(k)
        r1 = vb / va if va and vb and va > 0 else None
        r2 = vc / vb if vb and vc and vb > 0 else None
        stream = k.startswith("st")
        flag = ""
        # super-linear = worse than the 10x data growth; ignore sub-second
        # bases where JVM noise dominates the ratio
        if not stream:
            if r1 is not None and r1 > 10 and vb > 2.0:
                flag += "SUPRA(0.1→1) "
            if r2 is not None and r2 > 10 and vc > 2.0:
                flag += "SUPRA(1→10) "
        fmt = lambda v: f"{v:.2f}" if v is not None else "—"
        print(f"| {k} | {fmt(va)} | {fmt(vb)} | {fmt(vc)} | {fmt(r1)} | {fmt(r2)} | {flag.strip()} |")
        if flag:
            flagged.append((k, va, vb, vc))
    tot = lambda d: sum(v for v in d.values() if v and v > 0)
    print()
    print(f"totals (sum of per-query min): sf0.1 {tot(qa):.1f} s, "
          f"sf1 {tot(qb):.1f} s, sf10 {tot(qc):.1f} s")
    print(f"failed: sf0.1 {a.get('failed')}, sf1 {b.get('failed')}, sf10 {c.get('failed')}")
    if flagged:
        print("\nFLAGGED super-linear rows:")
        for k, va, vb, vc in flagged:
            print(f"  {k}: {va} → {vb} → {vc}")
        sys.exit(1)


if __name__ == "__main__":
    main()
