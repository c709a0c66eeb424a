#!/usr/bin/env python3
"""Host-speed calibration: a fixed single-threaded CPU workload whose
wall time moves with the machine, never with the engine. Run it next to
every full bench and record the number — when a whole bench shifts
10-20% with no plan changes (it happened round 9 and round 11), this
separates "the host is slower tonight" from "the engine regressed"
WITHOUT needing a prior bench to diff against.

Usage: python3 scripts/hostcal.py   → one line: {"hostcal_ms": N}
Reference points (record new ones in NOTES.md):
  round 11 (2026-08-15, bench totals ~333 s): see NOTES.md
"""
import json
import time


def workload() -> int:
    # integer arithmetic + hashing: immune to numpy/BLAS variance,
    # deterministic, ~1-2 s on an idle core
    acc = 0
    h = 1469598103934665603
    for i in range(8_000_000):
        h = (h ^ i) * 1099511628211 % (1 << 64)
        acc = (acc + h) % 1000000007
    return acc


def main():
    # best-of-3: contention only ever inflates, the minimum measures
    # the machine
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = workload()
        times.append((time.perf_counter() - t0) * 1000)
    assert r == 968841315, f"workload drifted: {r}"
    print(json.dumps({"hostcal_ms": round(min(times), 1)}))


if __name__ == "__main__":
    main()
