#!/usr/bin/env python3
"""Self-test for the scale-leg gate (same contract as test_benchgate:
the gate only protects the engine if its own behaviors are pinned).

Run: python3 scripts/test_scalegate.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(HERE, "scalegate.py")


def run(tmp, scaled, base, scale="10", notes=None):
    gate = os.path.join(tmp, "scalegate.py")
    if not os.path.exists(gate):
        with open(GATE) as f:
            src = f.read()
        with open(gate, "w") as f:
            f.write(src)
    nf = os.path.join(tmp, "scalegate_notes.json")
    if notes is not None:
        with open(nf, "w") as f:
            json.dump(notes, f)
    elif os.path.exists(nf):
        os.remove(nf)
    paths = []
    for i, payload in enumerate((scaled, base)):
        p = os.path.join(tmp, f"s{i}.json")
        with open(p, "w") as f:
            json.dump(payload, f)
        paths.append(p)
    r = subprocess.run([sys.executable, gate, *paths, scale],
                       capture_output=True, text=True)
    return r.returncode, r.stdout + r.stderr


def payload(queries, **extra):
    d = {"metric": "total", "value": sum(v for v in queries.values()
                                         if v > 0),
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

        rc, out = run(tmp, payload({"q1": 2.3, "q2": 4.5}), base)
        check("sublinear scale leg passes",
              rc == 0 and "SCALEGATE PASS" in out, out)

        rc, out = run(tmp, payload({"q1": 11.0, "q2": 4.5}), base)
        check("ratio >= scale factor fails as SUPERLINEAR",
              rc == 1 and "SUPERLINEAR" in out, out)

        rc, out = run(tmp, payload({"q1": 7.0, "q2": 4.5}), base)
        check("6x-10x band without a note warns but passes",
              rc == 0 and "WARN" in out and "q1" in out, out)

        rc, out = run(tmp, payload({"q1": 7.0, "q2": 4.5}), base,
                      notes={"q1": {"reason": "output grows 10x"}})
        check("6x-10x band with a documented note prints NOTED",
              rc == 0 and "NOTED" in out
              and "output grows 10x" in out, out)

        rc, out = run(tmp, payload({"q1": 2.0, "q2": 4.5}), base,
                      notes={"q1": {"reason": "obsolete"}})
        check("a note outside the warn band prints STALE but only "
              "warns (scale-leg ratios swing 3x on a noisy host)",
              rc == 0 and "STALE-NOTE" in out, out)

        rc, out = run(tmp, payload({"q1": 11.0, "q2": 4.5}), base,
                      notes={"q1": {"reason": "output grows"}})
        check("a note can NEVER excuse a superlinear ratio",
              rc == 1 and "SUPERLINEAR" in out, out)

        # hysteresis: a note just UNDER the warn bar (5.0x vs 6x warn,
        # above the 0.8x stale floor of 4.8x) is kept — host noise
        # swings ratios ~20% and a boundary note must not flap
        rc, out = run(tmp, payload({"q1": 5.0, "q2": 4.5}), base,
                      notes={"q1": {"reason": "output grows 10x"}})
        check("a note within hysteresis of the warn bar is NOT stale",
              rc == 0 and "STALE-NOTE" not in out, out)

        rc, out = run(tmp, payload({"q1": -1.0, "q2": 4.5},
                                   failed=["q1"]), base)
        check("a query that fails at scale fails the gate",
              rc == 1 and "FAILED-AT-SCALE" in out, out)

        # a null median (query crashed before timing) must be treated
        # as failed-at-scale, not crash the gate with a TypeError
        nullq = payload({"q2": 4.5})
        nullq["queries"]["q1"] = None
        nullq["plain"]["q1"] = None
        rc, out = run(tmp, nullq, base,
                      notes={"q1": {"reason": "should not TypeError"}})
        check("a null scaled median is FAILED-AT-SCALE, not a crash",
              rc == 1 and "FAILED-AT-SCALE" in out
              and "Traceback" not in out, out)

        rc, out = run(tmp, payload({"q1": 7.0, "q2": 4.5}), base,
                      notes={"q1": {"reason": "output grows 10x",
                                    "focused_median_s": 6.5,
                                    "reps": 5, "date": "2026-08-16"}})
        check("NOTED prints committed focused-rep evidence",
              rc == 0 and "focused: 6.5s median of 5 reps" in out, out)

        # host normalization: scaled leg ran on a 1.5x-slower host, so
        # an 11x raw ratio is ~7.3x normalized — warn band, not fail
        rc, out = run(tmp, payload({"q1": 11.0, "q2": 4.5},
                                   hostcal_par_ms=300.0),
                      payload({"q1": 1.0, "q2": 2.0},
                              hostcal_par_ms=200.0))
        check("host-normalized ratio keeps a slow-host 11x out of "
              "SUPERLINEAR",
              rc == 0 and "WARN" in out and "normalized" in out, out)

        # contention-poisoned MEAN (r17 incident): the base leg's
        # hostcal pair drifted 150 -> 210 ms (mean 180), while the
        # scaled leg sat at a clean 150. Mean-normalization would
        # inflate a steady 9.1x raw ratio to 10.9x (SUPERLINEAR);
        # min-of-pair reads both hosts at 150 and keeps it in the
        # warn band where its output-growth note belongs.
        rc, out = run(tmp, payload({"q1": 9.1, "q2": 2.0},
                                   hostcal_par_ms=150.0,
                                   hostcal_par_ms_start=150.0,
                                   hostcal_par_ms_end=150.0),
                      payload({"q1": 1.0, "q2": 2.0},
                              hostcal_par_ms=180.0,
                              hostcal_par_ms_start=150.0,
                              hostcal_par_ms_end=210.0),
                      notes={"q1": {"reason": "output grows 10x"}})
        check("a >20% drifted base pair normalizes by its MIN sample, "
              "not the contention-poisoned mean",
              rc == 0 and "base pair drifted >20%" in out
              and "SUPERLINEAR" not in out and "NOTED" in out, out)

        # same drift on the SCALED side: min-of-pair applies per side
        rc, out = run(tmp, payload({"q1": 9.1, "q2": 2.0},
                                   hostcal_par_ms=180.0,
                                   hostcal_par_ms_start=150.0,
                                   hostcal_par_ms_end=210.0),
                      payload({"q1": 1.0, "q2": 2.0},
                              hostcal_par_ms=150.0,
                              hostcal_par_ms_start=150.0,
                              hostcal_par_ms_end=150.0),
                      notes={"q1": {"reason": "output grows 10x"}})
        check("a >20% drifted scaled pair also normalizes by its MIN",
              rc == 0 and "scaled pair drifted >20%" in out, out)

        rc, out = run(tmp, payload({"q1": 2.0}), base, scale="1")
        check("scale <= 1 is a usage error",
              rc == 2, out)

        rc, out = run(tmp, payload({"q1": 2.0, "q3": 2.0}), base)
        check("a scaled query with no base number is skipped loudly",
              rc == 0 and "no base number for q3" in out, out)

        # remeasured protocol (r16): a validated substitution gates on
        # the focused median — an 83s host-episode reading substituted
        # with a 23s idle-host median must pass, with the full-run
        # number printed for audit
        rc, out = run(tmp, payload({"q1": 2.3, "q2": 4.5},
                                   remeasured={"q1": {
                                       "median": 2.3,
                                       "full_run_median": 11.0,
                                       "reps": 5}}), base)
        check("a valid remeasured entry gates on the focused median",
              rc == 0 and "REMEASURED" in out
              and "full-run 11.0s" in out, out)

        rc, out = run(tmp, payload({"q1": 2.3, "q2": 4.5},
                                   remeasured={"q1": {
                                       "median": 9.9,
                                       "full_run_median": 11.0,
                                       "reps": 5}}), base)
        check("a remeasured median that does not match the published "
              "number is MALFORMED (exit 2)",
              rc == 2 and "MALFORMED" in out, out)

        rc, out = run(tmp, payload({"q1": 2.3, "q2": 4.5},
                                   remeasured={"q1": {
                                       "median": 2.3,
                                       "full_run_median": 11.0,
                                       "reps": 2}}), base)
        check("a remeasured entry with reps < 3 is MALFORMED",
              rc == 2 and "reps=2" in out, out)

        rc, out = run(tmp, payload({"q1": 2.3, "q2": 4.5},
                                   remeasured={"q1": {
                                       "median": 2.3,
                                       "reps": 5}}), base)
        check("a remeasured entry without full_run_median is MALFORMED",
              rc == 2 and "full_run_median" in out, out)

    if failures:
        print(f"== {len(failures)} self-test failure(s) ==")
        return 1
    print("== scalegate self-test: all pass ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
