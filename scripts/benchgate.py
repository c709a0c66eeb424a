#!/usr/bin/env python3
"""Bench regression gate: diff a fresh bench JSON against the previous
round's committed numbers and FAIL on any query whose median grew >3x —
the net that would have caught q209 shipping at 69 s (nothing compared
it to anything).

Usage: python3 scripts/benchgate.py NEW.json BASE.json [factor]

A regression only counts when the measurement is trustworthy: queries
whose NEW spread exceeds their NEW median are reported as NOISY, not
failed (a contended host can triple a median without any plan change —
re-run those before believing either verdict). Queries present on only
one side are listed informationally.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load(path):
        d = json.load(open(path))
        # BENCH_r{N}.json wraps the bench line under "parsed" (None when
        # the driver's stdout tail truncated — use bench_out.json then)
        if "queries" not in d:
            d = d.get("parsed") or {}
        if "queries" not in d:
            sys.exit(f"{path}: no 'queries' payload (truncated capture? "
                     f"use bench_out.json)")
        return d

    new = load(sys.argv[1])
    base = load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    nq, bq = new["queries"], base["queries"]
    nsp = new.get("spread", {})
    # sub-second queries are dominated by fixed per-query costs (session,
    # planning, JIT); a 3x there is noise, not a plan regression
    floor_sec = 1.0

    regressions, noisy = [], []
    for name in sorted(set(nq) & set(bq)):
        n, b = nq[name], bq[name]
        if n < max(b * factor, floor_sec):
            continue
        if nsp.get(name, 0.0) > n:
            noisy.append((name, b, n, nsp.get(name, 0.0)))
        else:
            regressions.append((name, b, n, nsp.get(name, 0.0)))

    for name, b, n, sp in noisy:
        print(f"NOISY  {name}: {b:.2f}s -> {n:.2f}s (spread {sp:.2f}s "
              f"> median; re-run before trusting)")
    for name, b, n, sp in regressions:
        print(f"REGRESSION  {name}: {b:.2f}s -> {n:.2f}s "
              f"({n / b:.1f}x, spread {sp:.2f}s)")
    only_new = sorted(set(nq) - set(bq))
    if only_new:
        print(f"new queries (no baseline): {len(only_new)}")
    gone = sorted(set(bq) - set(nq))
    if gone:
        print(f"queries missing vs baseline: {gone}")

    if regressions:
        print(f"== GATE FAIL: {len(regressions)} regression(s) ==")
        return 1
    print(f"== GATE PASS: {len(set(nq) & set(bq))} compared, "
          f"{len(noisy)} noisy ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
