#!/usr/bin/env python3
"""Merge uniform-vs-skew Bench outputs into a SKEW_SWEEP artifact rung.

The skew sweep (round 13; VERDICT round-11 ask #8 extends it to the top
rung) compares the same hot-key query set over a uniformly-replicated
corpus and a GRAFT_SF_SKEW=1 corpus (10% hot user / hot l_orderkey /
hot verbatim text — see tools/make_sf1.py). This tool merges the two
Bench JSON lines for one SF into the sweep artifact's per-rung shape:

  python3 tools/skew_sweep.py SWEEP.json sf30 UNIFORM.json SKEW.json

SWEEP.json is created if absent (with the standard mode header) and the
named rung is replaced if present. Ratios are skew/uniform rounded to
2 decimals; a -1 (failed/DNF) on either side propagates ratio = -1 so a
crash can never read as a speedup.
"""
import json
import os
import sys


def qmin(bench):
    src = bench.get("queries_min") or bench.get("queries") or {}
    return {k: v for k, v in src.items()}


def main():
    sweep_path, rung, uni_path, skew_path = sys.argv[1:5]
    uni = qmin(json.load(open(uni_path)))
    skew = qmin(json.load(open(skew_path)))
    keys = sorted(set(uni) & set(skew))
    ratio = {}
    for k in keys:
        u, s = uni[k], skew[k]
        ratio[k] = -1 if (u is None or s is None or u <= 0 or s < 0) \
            else round(s / u, 2)
    if os.path.exists(sweep_path):
        sweep = json.load(open(sweep_path))
    else:
        sweep = {"mode": "GRAFT_SF_SKEW=1 (10% hot user / hot "
                         "l_orderkey / hot verbatim text)"}
    sweep[rung] = {
        "uniform_sec": {k: uni[k] for k in keys},
        "skew_sec": {k: skew[k] for k in keys},
        "ratio": ratio,
    }
    with open(sweep_path, "w") as f:
        json.dump(sweep, f, indent=1)
    worst = max((v for v in ratio.values() if v > 0), default=-1)
    print(f"{rung}: {len(keys)} queries, worst skew/uniform ratio {worst}")


if __name__ == "__main__":
    main()
