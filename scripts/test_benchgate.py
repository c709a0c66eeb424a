#!/usr/bin/env python3
"""Self-test for the bench regression gate: the gate only protects the
engine if its own behaviors are pinned. Covers the two incidents that
motivated them (a red flagless run hiding behind a CLI flag; the compact
stdout payload silently gating 25/275 queries) plus the core exits.

Run: python3 scripts/test_benchgate.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(HERE, "benchgate.py")


def run(tmp, new, base, *args, accept_file=None):
    """Run benchgate in a sandbox dir so the repo accept-file doesn't
    leak into fixture behavior; returns (exit_code, stdout).
    """
    gate = os.path.join(tmp, "benchgate.py")
    if not os.path.exists(gate):
        with open(GATE) as f:
            src = f.read()
        with open(gate, "w") as f:
            f.write(src)
    acc = os.path.join(tmp, "benchgate_accept.json")
    if accept_file is not None:
        with open(acc, "w") as f:
            json.dump(accept_file, f)
    elif os.path.exists(acc):
        os.remove(acc)
    paths = []
    for i, payload in enumerate((new, base)):
        p = os.path.join(tmp, f"b{i}.json")
        with open(p, "w") as f:
            json.dump(payload, f)
        paths.append(p)
    r = subprocess.run([sys.executable, gate, *paths, *args],
                       capture_output=True, text=True)
    return r.returncode, r.stdout + r.stderr


def payload(queries, **extra):
    d = {"metric": "total", "value": sum(queries.values()),
         "queries": queries, "plain": dict(queries),
         "spread": {k: 0.01 for k in queries}, "failed": []}
    d.update(extra)
    return d


def main():
    failures = []

    def check(name, cond, detail=""):
        print(("PASS " if cond else "FAIL ") + name)
        if not cond:
            failures.append(f"{name}: {detail}")

    with tempfile.TemporaryDirectory() as tmp:
        base = payload({"q1": 1.0, "q2": 2.0})

        rc, out = run(tmp, payload({"q1": 1.1, "q2": 2.1}), base)
        check("clean run passes", rc == 0 and "GATE PASS" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base)
        check("3x growth fails", rc == 1 and "REGRESSION" in out, out)

        rc, out = run(tmp, payload({"q1": -1.0, "q2": 2.0},
                                   failed=["q1"]), base)
        check("working->failing query fails the gate",
              rc == 1 and "FAILED" in out, out)

        noisy = payload({"q1": 4.0, "q2": 2.0})
        noisy["spread"]["q1"] = 9.0  # spread > median: contention
        rc, out = run(tmp, noisy, base)
        check("noisy grower demands a re-run (exit 3, not a pass)",
              rc == 3 and "NOISY" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base,
                      accept_file={"q1": "definition changed"})
        check("accept-file turns the regression into a loud CHANGED",
              rc == 0 and "CHANGED" in out
              and "definition changed" in out, out)

        rc, out = run(tmp, payload({"q1": 1.0, "q2": 2.0}), base,
                      accept_file={"q1": "absorbed last round"})
        check("absorbed accept entry is reported for pruning",
              rc == 0 and "PRUNE" in out, out)

        compact = {"metric": "total", "value": 3.0,
                   "queries": {"q1": 1.0},
                   "queries_truncated_to_slowest": 25}
        rc, out = run(tmp, compact, base)
        check("compact slowest-25 payload is refused",
              rc != 0 and "bench_out.json" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base,
                      "--accept=q1")
        check("--accept flag still works ad hoc",
              rc == 0 and "CHANGED" in out, out)

        # sub-second floor: 3x on a 0.1s query is fixed-cost noise
        rc, out = run(tmp, payload({"q1": 0.4, "q2": 2.0}),
                      payload({"q1": 0.1, "q2": 2.0}))
        check("sub-second 3x is not a regression", rc == 0, out)

    if failures:
        print(f"== {len(failures)} self-test failure(s) ==")
        return 1
    print("== benchgate self-test: all pass ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
