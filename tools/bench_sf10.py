#!/usr/bin/env python3
"""Assemble + gate the sf10 spot sweep (100x sf0.1 data).

Takes the subset bench JSON produced by `graft.Bench <subset>` against
/tmp/sf10 (and optionally a same-subset sf0.1 re-run for a same-box
denominator), joins per query against the committed full sf0.1 snapshot
(the newest BENCH_HISTORY/r*.json), computes sf10/sf0.1 growth ratios and
per-family aggregates, and writes BENCH_SF10.json.

Gate: zero rows over 150x (vs sf0.1). 100x data at 150x wall allows a
1.5x per-row efficiency loss — anything beyond that is a real
nonlinearity (pair blowup, global sort, uncapped bucket join), not
noise. Exit 1 lists the offenders.

Usage: python3 tools/bench_sf10.py <sf10_subset.json> [<sf01_subset.json>]
"""
import glob
import json
import re
import sys

GATE = 150.0


def latest_history() -> str:
    """Newest committed full-sweep snapshot (BENCH_HISTORY/r<N>.json) —
    derived, not hardcoded, so this never silently goes stale next round."""
    snaps = glob.glob("BENCH_HISTORY/r*.json")
    if not snaps:
        print("bench_sf10: FAIL — no BENCH_HISTORY/r*.json snapshot")
        sys.exit(1)
    return max(snaps, key=lambda p: int(re.sub(r"\D", "", p) or 0))

FAMILIES = ["mm", "doc", "dedup", "graph", "cdc", "ann", "emb", "ev",
            "corpus", "tbl", "ts", "q"]


def family(name: str) -> str:
    head = name.split("_", 1)[0]
    return head if head in FAMILIES else "q"


def main(sf10_path: str, sf01_path: str | None) -> None:
    sf10 = json.load(open(sf10_path))
    if sf10.get("errors"):
        print(f"bench_sf10: FAIL — bench errors: {sf10['errors']}")
        sys.exit(1)
    base = json.load(open(latest_history()))["queries"]
    # a same-box subset re-run REPLACES the committed full-sweep snapshot
    # as the denominator when provided: both numerator and denominator
    # then come from this box/run, so the ratio isolates data growth from
    # box drift. (min() would keep whichever box was faster — on a slower
    # box that inflates ratios and can fail the gate falsely.)
    if sf01_path:
        fresh = json.load(open(sf01_path))["queries"]
        base = {**base, **fresh}

    rows, fams, failures = {}, {}, []
    for name, t10 in sorted(sf10["queries"].items()):
        t01 = base.get(name)
        if t01 is None or t01 <= 0:
            print(f"bench_sf10: WARN no sf0.1 baseline for {name}")
            continue
        ratio = t10 / t01
        rows[name] = {"sf0.1_sec": round(t01, 3), "sf10_sec": round(t10, 3),
                      "ratio": round(ratio, 2)}
        f = fams.setdefault(family(name), {"n": 0, "sf0.1_sec": 0.0,
                                           "sf10_sec": 0.0, "worst_ratio": 0.0})
        f["n"] += 1
        f["sf0.1_sec"] += t01
        f["sf10_sec"] += t10
        f["worst_ratio"] = max(f["worst_ratio"], round(ratio, 2))
        if ratio > GATE:
            failures.append((name, ratio))

    for f in fams.values():
        f["ratio"] = round(f["sf10_sec"] / f["sf0.1_sec"], 2)
        f["sf0.1_sec"] = round(f["sf0.1_sec"], 3)
        f["sf10_sec"] = round(f["sf10_sec"], 3)

    out = {"metric": "sf10_spot_sweep", "unit": "sec", "data_factor": 100,
           "gate_ratio": GATE, "n_queries": len(rows),
           "total_sf0.1_sec": round(sum(r["sf0.1_sec"] for r in rows.values()), 1),
           "total_sf10_sec": round(sum(r["sf10_sec"] for r in rows.values()), 1),
           "queries": rows, "families": fams,
           "sf": sf10.get("sf", "/tmp/sf10")}
    with open("BENCH_SF10.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)

    print(f"bench_sf10: {len(rows)} rows, total {out['total_sf0.1_sec']}s "
          f"sf0.1 -> {out['total_sf10_sec']}s sf10 "
          f"({out['total_sf10_sec']/max(out['total_sf0.1_sec'],1e-9):.1f}x wall at 100x data)")
    for name, fam in sorted(fams.items()):
        print(f"  family {name:8s} n={fam['n']:2d} ratio {fam['ratio']:6.1f}x "
              f"worst {fam['worst_ratio']:6.1f}x")
    # watch list (non-failing): rows over 15x deserve a growth-model
    # scaladoc stating the expected asymptotic and why the measured ratio
    # matches it — keeps the sweep gate reviewable as rows are added
    watch = sorted(((n, r["ratio"]) for n, r in rows.items() if r["ratio"] > 15.0),
                   key=lambda kv: -kv[1])
    if watch:
        print(f"bench_sf10: WATCH — {len(watch)} row(s) over 15x "
              f"(need a growth-model scaladoc):")
        for name, r in watch:
            print(f"  WATCH {name}: {r:.1f}x")
    if failures:
        print(f"bench_sf10: FAIL — {len(failures)} row(s) over the {GATE}x gate:")
        for name, r in sorted(failures, key=lambda kv: -kv[1]):
            print(f"  OVER  {name}: {r:.1f}x")
        sys.exit(1)
    print(f"bench_sf10: OK — zero rows over the {GATE}x gate")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
