#!/usr/bin/env python3
"""Merge an sf1 (10x) bench run with an sf0.1 reference run into
BENCH_SF1.json: {query: {sf0.1_sec, sf1_sec, ratio}} plus totals.

Usage: python3 tools/merge_sf1.py <sf1_bench.json> <sf01_bench.json> [out]

Flags any query whose sf1/sf0.1 ratio exceeds GATE (default 12x — 10x
data plus noise headroom on sub-second fixed overheads) so superlinear
blowups (uncapped bucket joins, global windows, re-run codecs) fail loudly
instead of hiding in the sweep.
"""
import json
import sys

GATE = 12.0

def main(sf1_path, sf01_path, out_path="BENCH_SF1.json"):
    sf1 = json.load(open(sf1_path))
    sf01 = json.load(open(sf01_path))
    q1, q0 = sf1["queries"], sf01["queries"]
    merged, hot = {}, []
    for name in sorted(set(q1) & set(q0)):
        a, b = q0[name], q1[name]
        ratio = round(b / a, 2) if a > 0 else None
        merged[name] = {"sf0.1_sec": round(a, 3), "sf1_sec": round(b, 3),
                        "ratio": ratio}
        # sub-0.3s sf0.1 rows are all fixed overhead; ratio is meaningless
        if ratio is not None and ratio > GATE and a >= 0.3:
            hot.append((name, ratio))
    doc = {
        "gate_ratio": GATE,
        "n_queries": len(merged),
        "total_sf0.1_sec": round(sum(q0[n] for n in merged), 1),
        "total_sf1_sec": round(sum(q1[n] for n in merged), 1),
        "n_over_gate": len(hot),
        "over_gate": [{"query": n, "ratio": r} for n, r in sorted(hot, key=lambda x: -x[1])],
        "queries": merged,
    }
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"{len(merged)} queries; total {doc['total_sf0.1_sec']}s -> "
          f"{doc['total_sf1_sec']}s; {len(hot)} over the {GATE}x gate")
    for n, r in sorted(hot, key=lambda x: -x[1]):
        print(f"  OVER  {n}: {r}x")
    sys.exit(1 if hot else 0)

if __name__ == "__main__":
    main(*sys.argv[1:])
