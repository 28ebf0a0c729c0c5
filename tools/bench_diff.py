#!/usr/bin/env python3
"""Bench regression gate.

Compares a fresh bench JSON (graft.Bench output: {"queries": {name: sec},
"errors": {...}}) against the most recent BENCH_HISTORY snapshot and exits
non-zero when any query regressed by BOTH ratio AND absolute-time margins
(sub-second wobble on this multi-tenant box is ~0.3-0.5 s of fixed stage-
scheduling overhead, so a pure ratio gate would false-positive constantly).

Handles BOTH bench schemas:
  - graft.Bench output      {"queries": {name: sec}}           — per-round sf0.1
  - ScaleUp sweep output    {"queries": {name: {"sf1_sec": s}}} — BENCH_SF1
The sf1 schema is auto-detected (dict-valued queries) and compared on
`sf1_sec`; its history lives in BENCH_HISTORY_SF1/ so scale regressions
(e.g. a dedup family quietly going quadratic at 10x data) fail CI the
same way sf0.1 regressions do.

Usage:
    python3 tools/bench_diff.py NEW.json [OLD.json]
        NEW.json  fresh bench output (e.g. target/bench.json or BENCH_SF1.json)
        OLD.json  baseline; default = lexicographically-last snapshot in
                  BENCH_HISTORY/ (or BENCH_HISTORY_SF1/ for the sf1 schema)

Gate: FAIL when new > 1.5 * old AND new - old > 0.5 s for any query
(1.0 s at sf1 — the 10x runs carry proportionally more scheduling noise),
or when the new run has bench errors. New queries (absent in the baseline)
and removed queries are reported but never fail the gate.
"""
import json
import glob
import os
import sys

RATIO = 1.5
ABS_SEC = 0.5
ABS_SEC_SF1 = 1.0


def load(path):
    with open(path) as f:
        return json.load(f)


def times(bench):
    """Normalize either schema to {name: seconds}."""
    q = bench.get("queries", {})
    if q and isinstance(next(iter(q.values())), dict):
        return {k: v["sf1_sec"] for k, v in q.items()}, True
    return q, False


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    new = load(sys.argv[1])
    nq, is_sf1 = times(new)
    hist_dir = "BENCH_HISTORY_SF1" if is_sf1 else "BENCH_HISTORY"
    abs_sec = ABS_SEC_SF1 if is_sf1 else ABS_SEC
    if len(sys.argv) > 2:
        old_path = sys.argv[2]
    else:
        hist = sorted(glob.glob(
            os.path.join(os.path.dirname(__file__), "..", hist_dir, "*.json")))
        if not hist:
            print(f"bench_diff: no {hist_dir} baseline; skipping gate")
            return 0
        old_path = hist[-1]
    oq, _ = times(load(old_path))

    failures, notes = [], []
    for name, t in sorted(nq.items()):
        if name not in oq:
            notes.append(f"  NEW   {name}: {t:.2f}s (no baseline)")
            continue
        t0 = oq[name]
        if t > RATIO * t0 and t - t0 > abs_sec:
            failures.append(f"  SLOW  {name}: {t0:.2f}s -> {t:.2f}s ({t / max(t0, 1e-9):.2f}x)")
    for name in sorted(set(oq) - set(nq)):
        notes.append(f"  GONE  {name}: was {oq[name]:.2f}s")
    errs = new.get("errors", {})
    for name, msg in sorted(errs.items()):
        failures.append(f"  ERROR {name}: {msg[:120]}")

    print(f"bench_diff: {len(nq)} queries vs baseline {os.path.basename(old_path)} "
          f"({len(oq)} queries); total {sum(nq.values()):.1f}s vs {sum(oq.values()):.1f}s")
    for line in notes:
        print(line)
    if failures:
        print(f"bench_diff: FAIL — {len(failures)} regression(s) "
              f"(> {RATIO}x and > {abs_sec}s, or bench error):")
        for line in failures:
            print(line)
        return 1
    print("bench_diff: OK — no query regressed beyond the gate")
    return 0


if __name__ == "__main__":
    sys.exit(main())
