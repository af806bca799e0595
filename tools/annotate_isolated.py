#!/usr/bin/env python3
"""Make ladder numbers plan-attributable (round 11, VERDICT item 2).

Single-rep in-suite medians at rehearsal SFs conflate plan cost with
suite placement (cache/GC/scratch contention from 195 neighbors):
r14's q01 read 77 s in-suite vs 17.3 s isolated — a 4.5x inflation the
artifact silently carried. This tool merges isolated re-probes into a
full-suite artifact:

  python3 tools/annotate_isolated.py SUITE.json ISOLATED.json [...]

For every query present in any ISOLATED.json (a Bench output run with
an explicit query list), the suite artifact gains
`isolated_s[query] = isolated seconds`, and queries whose in-suite
number exceeds 2x the isolated probe are listed under
`suite_inflated` — the flag that says "read isolated_s, not the
in-suite row, for plan cost". The merged artifact is written in place
(SUITE.json), with the original preserved as SUITE.json.orig once.
"""
import json
import shutil
import sys


def main():
    suite_path = sys.argv[1]
    suite = json.load(open(suite_path))
    iso = {}
    for p in sys.argv[2:]:
        d = json.load(open(p))
        src = d.get("queries_min") or d.get("queries") or {}
        for k, v in src.items():
            if v is not None and v >= 0:
                # keep the best (most contention-free) probe
                iso[k] = min(iso.get(k, float("inf")), v)
    inflated = {}
    base = suite.get("queries_min") or suite.get("queries") or {}
    for k, v in iso.items():
        s = base.get(k)
        if s is not None and s > 2 * v:
            inflated[k] = {"suite_s": s, "isolated_s": v,
                           "inflation": round(s / v, 2)}
    suite["isolated_s"] = {k: round(v, 3) for k, v in sorted(iso.items())}
    suite["suite_inflated"] = inflated
    orig = suite_path + ".orig"
    try:
        shutil.copyfile(suite_path, orig)
    except FileExistsError:
        pass
    with open(suite_path, "w") as f:
        json.dump(suite, f, indent=1, sort_keys=True)
    print(f"annotated {suite_path}: {len(iso)} isolated probes, "
          f"{len(inflated)} in-suite rows flagged >2x")
    for k, v in sorted(inflated.items(), key=lambda kv: -kv[1]["inflation"]):
        print(f"  {k}: suite {v['suite_s']}s vs isolated {v['isolated_s']}s "
              f"({v['inflation']}x)")


if __name__ == "__main__":
    main()
