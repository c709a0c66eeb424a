#!/usr/bin/env python3
"""Bench regression gate: diff a fresh bench JSON against the previous
round's committed numbers and FAIL on any query whose median grew >3x —
the net that would have caught q209 shipping at 69 s (nothing compared
it to anything).

Usage: python3 scripts/benchgate.py NEW.json BASE.json [factor]
         [--accept=name,name,...]

Accepted definition changes live IN-REPO at scripts/benchgate_accept.json
({"query_name": "one-line reason", ...}), loaded automatically on every
invocation, so the bare flagless run is the authoritative one: a query
whose DEFINITION deliberately changed this round (e.g. it gained an
exact-twin validation stage) has no valid prior-median baseline, and is
reported loudly as CHANGED instead of failing the gate. The next round's
baseline absorbs the new cost, at which point the entry must be PRUNED
(a stale entry is reported so it can't silently pre-approve a future
regression). --accept=name,... still works for ad-hoc additions.

A >factor growth whose NEW spread exceeds its NEW median is reported as
NOISY and is a MANDATORY-RERUN failure (exit 3, distinct from the
regression exit 1): a contended host can triple a median without any
plan change, but "noisy" must never read as "passed" — re-run the named
queries on an idle host and gate on that. The comparison prefers the
"plain" per-query medians when both files carry them (best-3 published
numbers are not comparable to plain-median baselines). Queries present
on only one side are listed informationally.

Exit codes: 0 pass, 1 regression(s), 2 usage, 3 noisy-rerun-required.
"""
import json
import os
import sys

ACCEPT_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchgate_accept.json")


def main() -> int:
    accepted = set()
    reasons = {}
    try:
        with open(ACCEPT_FILE) as f:
            reasons = json.load(f)
        accepted |= set(reasons)
        if reasons:
            print(f"accept-file {ACCEPT_FILE}: "
                  f"{', '.join(sorted(reasons))}")
    except FileNotFoundError:
        pass
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--accept="):
            accepted |= {q for q in a[len("--accept="):].split(",") if q}
        else:
            argv.append(a)
    sys.argv = [sys.argv[0]] + argv
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
        # Bench's COMPACT stdout line carries only the slowest-25 queries
        # and no 'plain'/'spread' — gating on it would silently compare
        # 25/275 queries and disable noisy detection. Refuse it.
        if "queries_truncated_to_slowest" in d or "plain" not in d:
            sys.exit(f"{path}: truncated/compact bench payload "
                     f"(slowest-{d.get('queries_truncated_to_slowest')} "
                     f"only) — gate on the full bench_out.json instead")
        return d

    new = load(sys.argv[1])
    base = load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    # plain medians compare like-for-like; "queries" may hold best-3
    # values for noisy entries (only use plain when BOTH sides have it)
    if "plain" in new and "plain" in base:
        nq = {**new["queries"], **new["plain"]}
        bq = {**base["queries"], **base["plain"]}
    else:
        nq, bq = new["queries"], base["queries"]
    nsp = new.get("spread", {})
    # sub-second queries are dominated by fixed per-query costs (session,
    # planning, JIT); a 3x there is noise, not a plan regression
    floor_sec = 1.0

    regressions, noisy = [], []
    # a query that regressed from WORKING to FAILING is the worst
    # regression of all — it used to fall through the growth check
    # (reported as -1, absent from 'plain') and the gate never saw it
    new_failed = set(new.get("failed", []))
    new_failed |= {k for k, v in nq.items() if v is not None and v < 0}
    for name in sorted(new_failed):
        b = bq.get(name)
        if b is not None and b > 0:
            regressions.append((name, b, -1.0, 0.0))
    changed = []
    for name in sorted(set(nq) & set(bq)):
        if name in new_failed:
            continue
        n, b = nq[name], bq[name]
        if n < max(b * factor, floor_sec):
            continue
        if name in accepted:
            changed.append((name, b, n))
        elif nsp.get(name, 0.0) > n:
            noisy.append((name, b, n, nsp.get(name, 0.0)))
        else:
            regressions.append((name, b, n, nsp.get(name, 0.0)))

    for name, b, n in changed:
        why = reasons.get(name, "accepted via --accept flag")
        print(f"CHANGED  {name}: {b:.2f}s -> {n:.2f}s ({n / b:.1f}x) — "
              f"deliberate definition change ({why}); next round's "
              f"baseline absorbs it")
    stale = sorted(set(reasons) - {c[0] for c in changed})
    if stale:
        print(f"accept-file entries that did NOT trigger (baseline has "
              f"absorbed them — PRUNE from benchgate_accept.json): "
              f"{', '.join(stale)}")

    for name, b, n, sp in noisy:
        print(f"NOISY  {name}: {b:.2f}s -> {n:.2f}s (spread {sp:.2f}s "
              f"> median; RE-RUN REQUIRED before this gate can pass)")
    for name, b, n, sp in regressions:
        if n < 0:
            print(f"REGRESSION  {name}: {b:.2f}s -> FAILED")
        else:
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
    if noisy:
        print(f"== GATE RERUN-REQUIRED: {len(noisy)} noisy grower(s) — "
              f"not a pass ==")
        return 3
    print(f"== GATE PASS: {len(set(nq) & set(bq))} compared ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
