#!/usr/bin/env python3
"""Self-test for the bench regression gate: the gate only protects the
engine if its own behaviors are pinned. Covers the incidents that
motivated them (a red flagless run hiding behind a CLI flag; the compact
stdout payload silently gating 25/275 queries; three rounds of manual
host-noise adjudication with the calibration recorded but unused; the
q142 two-round sub-gate drift; a hypothetical optimistic remeasured
substitution) plus the core exits.

Run: python3 scripts/test_benchgate.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GATE = os.path.join(HERE, "benchgate.py")


def run(tmp, new, base, *args, accept_file=None, prev2=None):
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
    extra = list(args)
    if prev2 is not None:
        p = os.path.join(tmp, "b2.json")
        with open(p, "w") as f:
            json.dump(prev2, f)
        extra.append(f"--prev2={p}")
    r = subprocess.run([sys.executable, gate, *paths, *extra],
                       capture_output=True, text=True)
    return r.returncode, r.stdout + r.stderr


def payload(queries, **extra):
    d = {"metric": "total", "value": sum(queries.values()),
         "queries": queries, "plain": dict(queries),
         "spread": {k: 0.01 for k in queries}, "failed": []}
    d.update(extra)
    return d


def accept(name, reason, baseline_median):
    return {name: {"reason": reason, "baseline_median": baseline_median}}


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

        # --- NOISY-ADJUDICATE: sub-gate >2x mover with a one-rep-wide
        # median (r14's q78: 2.17x with spread 13.8s on a 14.6s median
        # passed silently and cost a round of manual adjudication) ---
        adj = payload({"q1": 2.2, "q2": 2.0})   # 2.2x — under the 3x gate
        adj["spread"]["q1"] = 1.5               # spread/median 0.68 > 0.5
        rc, out = run(tmp, adj, base)
        check("sub-gate >2x mover with spread/median > 0.5 demands "
              "adjudication (exit 3)",
              rc == 3 and "NOISY-ADJUDICATE" in out and "q1" in out, out)

        tight = payload({"q1": 2.2, "q2": 2.0})
        tight["spread"]["q1"] = 0.3             # spread/median 0.14 — real
        rc, out = run(tmp, tight, base)
        check("sub-gate >2x mover with a TIGHT spread passes (a real "
              "sub-gate move is the cumulative check's job)",
              rc == 0 and "NOISY-ADJUDICATE" not in out, out)

        adj_rem = payload({"q1": 2.2, "q2": 2.0})
        adj_rem["spread"]["q1"] = 1.5
        adj_rem["remeasured"] = {"q1": {"median": 2.2,
                                        "full_run_median": 2.4,
                                        "reps": 10}}
        rc, out = run(tmp, adj_rem, base)
        check("a valid remeasured entry IS the adjudication — exempts "
              "the noisy-adjudicate flag",
              rc == 0 and "NOISY-ADJUDICATE" not in out
              and "REMEASURED" in out, out)

        # host-normalization applies: 2.2x raw on a 1.2x-slower host is
        # ~1.8x normalized — under the 2x adjudication bar
        slow = payload({"q1": 2.2, "q2": 2.0}, hostcal_par_ms=240.0)
        slow["spread"]["q1"] = 1.5
        rc, out = run(tmp, slow,
                      payload({"q1": 1.0, "q2": 2.0},
                              hostcal_par_ms=200.0))
        check("noisy-adjudicate bar is host-normalized",
              rc == 0 and "NOISY-ADJUDICATE" not in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base,
                      accept_file=accept("q1", "definition changed", 1.0))
        check("pinned accept entry turns the regression into CHANGED",
              rc == 0 and "CHANGED" in out
              and "definition changed" in out, out)

        rc, out = run(tmp, payload({"q1": 1.0, "q2": 2.0}), base,
                      accept_file=accept("q1", "absorbed last round", 1.0))
        check("absorbed accept entry HARD-FAILS until pruned",
              rc == 1 and "STALE-ACCEPT" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base,
                      accept_file=accept("q1", "old round", 0.5))
        check("accept entry pinned to a moved baseline HARD-FAILS",
              rc == 1 and "STALE-ACCEPT" in out
              and "baseline moved on" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base,
                      accept_file={"q1": "bare string"})
        check("bare-string accept entry is a usage error (exit 2)",
              rc == 2 and "baseline_median" in out, out)

        compact = {"metric": "total", "value": 3.0,
                   "queries": {"q1": 1.0},
                   "queries_truncated_to_slowest": 25}
        rc, out = run(tmp, compact, base)
        check("compact slowest-25 payload is refused",
              rc != 0 and "bench_out.json" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base,
                      "--accept=q1")
        check("--accept flag still works ad hoc (unpinned, no stale)",
              rc == 0 and "CHANGED" in out, out)

        # sub-second floor: 3x on a 0.1s query is fixed-cost noise
        rc, out = run(tmp, payload({"q1": 0.4, "q2": 2.0}),
                      payload({"q1": 0.1, "q2": 2.0}))
        check("sub-second 3x is not a regression", rc == 0, out)

        # --- hostcal normalization ---
        slow_host = payload({"q1": 4.0, "q2": 2.0}, hostcal_ms=2900.0)
        rc, out = run(tmp, slow_host, payload({"q1": 1.0, "q2": 2.0},
                                              hostcal_ms=2000.0))
        check("hostcal-normalized threshold absorbs a slow-host 4x "
              "(3x * 1.45 host ratio = 4.35x allowed)",
              rc == 0 and "thresholds normalized" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0},
                                   hostcal_ms=2000.0),
                      payload({"q1": 1.0, "q2": 2.0}, hostcal_ms=2000.0))
        check("same-hostcal 4x still fails, both ratios printed",
              rc == 1 and "4.0x raw" in out
              and "host-normalized" in out, out)

        rc, out = run(tmp, payload({"q1": 7.0, "q2": 2.0},
                                   hostcal_ms=20000.0),
                      payload({"q1": 1.0, "q2": 2.0}, hostcal_ms=2000.0))
        check("hostcal ratio is clamped to 2.0 — a corrupt calibration "
              "can't neuter the gate",
              rc == 1 and "clamped" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0}), base)
        check("missing hostcal says so and gates raw",
              rc == 1 and "hostcal unavailable" in out, out)

        # --- parallel-leg normalization (r13 VERDICT #4: the bench is
        # local[32]; the scalar leg under-corrects — a 30% parallel
        # drift showed against a flat scalar) ---
        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0},
                                   hostcal_ms=2000.0,
                                   hostcal_par_ms=290.0),
                      payload({"q1": 1.0, "q2": 2.0},
                               hostcal_ms=2000.0,
                               hostcal_par_ms=200.0))
        check("parallel leg drives thresholds when both sides carry it "
              "(flat scalar + 1.45x parallel absorbs the 4x)",
              rc == 0 and "hostcal_par (32-task leg)" in out
              and "thresholds normalized" in out
              and "informational" in out, out)

        rc, out = run(tmp, payload({"q1": 4.0, "q2": 2.0},
                                   hostcal_ms=2900.0,
                                   hostcal_par_ms=200.0),
                      payload({"q1": 1.0, "q2": 2.0},
                               hostcal_ms=2000.0,
                               hostcal_par_ms=200.0))
        check("a slow SCALAR leg cannot absorb a regression once the "
              "parallel leg exists on both sides (flat parallel gates)",
              rc == 1 and "REGRESSION" in out
              and "hostcal_par (32-task leg)" in out, out)

        # --- contention self-declaration (r13: the driver run's own
        # parallel calibration drifted 30% start-to-end and nothing
        # flagged the run as contended) ---
        contended = payload({"q1": 1.1, "q2": 2.0},
                            hostcal_par_ms_start=182.8,
                            hostcal_par_ms_end=134.6)
        rc, out = run(tmp, contended, base)
        check("a >20% within-run parallel-hostcal drift prints "
              "CONTENDED without changing the exit code",
              rc == 0 and "CONTENDED" in out and "NEW" in out, out)

        steady = payload({"q1": 1.1, "q2": 2.0},
                         hostcal_par_ms_start=150.0,
                         hostcal_par_ms_end=160.0)
        rc, out = run(tmp, steady, base)
        check("a <=20% within-run drift is NOT flagged as contended",
              rc == 0 and "CONTENDED" not in out, out)

        contended_base = payload({"q1": 1.0, "q2": 2.0},
                                 hostcal_par_ms_start=216.0,
                                 hostcal_par_ms_end=150.0)
        rc, out = run(tmp, payload({"q1": 1.1, "q2": 2.0}),
                      contended_base)
        check("BASE-side contention is flagged too (a contended "
              "baseline poisons every future comparison)",
              rc == 0 and "CONTENDED  BASE" in out, out)

        # --- remeasured protocol validation ---
        good_rem = payload({"q1": 1.1, "q2": 2.0})
        good_rem["remeasured"] = {"q1": {"median": 1.1,
                                         "full_run_median": 5.9,
                                         "reps": 5}}
        rc, out = run(tmp, good_rem, base)
        check("well-formed remeasured entry is printed and passes",
              rc == 0 and "REMEASURED" in out and "5.9" in out, out)

        for field, bad in (("full_run_median", None), ("reps", 2)):
            p = payload({"q1": 1.1, "q2": 2.0})
            e = {"median": 1.1, "full_run_median": 5.9, "reps": 5}
            if bad is None:
                del e[field]
            else:
                e[field] = bad
            p["remeasured"] = {"q1": e}
            rc, out = run(tmp, p, base)
            check(f"remeasured without valid {field} is refused (exit 2)",
                  rc == 2 and "MALFORMED" in out, out)

        lying = payload({"q1": 1.1, "q2": 2.0})
        lying["remeasured"] = {"q1": {"median": 0.4,
                                      "full_run_median": 5.9, "reps": 5}}
        rc, out = run(tmp, lying, base)
        check("remeasured median that mismatches the published number "
              "is refused",
              rc == 2 and "does not match published" in out, out)

        # --- under-coverage refusal (r12: a 1-query sf0.001 smoke
        # artifact at HEAD carried 'plain' and no truncation marker, so
        # the gate would have accepted it as a 1/290 baseline) ---
        rc, out = run(tmp, payload({"q1": 1.0}, n_registry=290), base)
        check("payload covering fewer queries than its own registry "
              "is refused (exit 2)",
              rc == 2 and "UNDER-COVERED" in out and "1/290" in out, out)

        rc, out = run(tmp,
                      payload({f"q{i}": 1.0 for i in range(1, 9)}),
                      payload({"q1": 1.0}))
        check("legacy payloads with a gross query-count gap are refused "
              "(smoke artifact as baseline)",
              rc == 2 and "partial/smoke" in out, out)

        rc, out = run(tmp,
                      payload({f"q{i}": 1.0 for i in range(1, 11)},
                              n_registry=10),
                      payload({f"q{i}": 1.0 for i in range(1, 10)}))
        check("genuine registry growth (10 vs 9) still gates",
              rc == 0 and "GATE PASS" in out, out)

        # two payloads EACH full against their own registry but whose
        # registries diverge >20% are both genuinely full runs — the
        # 80% heuristic is for legacy payloads only (r13 ADVICE: it
        # previously refused large query-set growth as 'smoke')
        rc, out = run(tmp,
                      payload({f"q{i}": 1.0 for i in range(1, 21)},
                              n_registry=20),
                      payload({f"q{i}": 1.0 for i in range(1, 9)},
                              n_registry=8))
        check("registry-stamped full runs with >20% registry divergence "
              "still gate (80% heuristic is legacy-only)",
              rc == 0 and "GATE PASS" in out, out)

        # --- stale-accept precision (r12 ADVICE) ---
        # accept entry naming a query NEW never measured must say so,
        # not claim absorption
        rc, out = run(tmp, payload({"q1": 1.0, "q2": 2.0}),
                      base, accept_file=accept("q3", "gone", 9.9))
        check("accept entry for a query absent from NEW is stale with "
              "an absent-from-NEW reason (not 'absorbed')",
              rc == 1 and "absent from NEW" in out
              and "absorbed" not in out, out)

        slow_new = payload({"q1": 3.5, "q2": 2.0}, hostcal_ms=2900.0)
        slow_base = payload({"q1": 1.0, "q2": 2.0}, hostcal_ms=2000.0)
        rc, out = run(tmp, slow_new, slow_base,
                      accept_file=accept("q1", "definition changed", 1.0))
        check("staleness is host-independent: an entry that triggers "
              "raw (3.5x) but not normalized (host 1.45x slower) is "
              "NOT stale",
              rc == 0 and "STALE-ACCEPT" not in out, out)

        # FAST new host (ratio < 1): normalized bar sits BELOW the raw
        # bar, so an entry absorbing a normalized-only trigger (2.5x
        # raw < 3x, but > 3x * 0.69 normalized) is live — raw-only
        # liveness would mark it STALE and the advised prune would turn
        # the next run into a REGRESSION (r13 ADVICE)
        fast_new = payload({"q1": 5.0, "q2": 2.0}, hostcal_ms=2000.0)
        fast_base = payload({"q1": 2.0, "q2": 2.0}, hostcal_ms=2900.0)
        rc, out = run(tmp, fast_new, fast_base,
                      accept_file=accept("q1", "definition changed", 2.0))
        check("staleness is host-independent in BOTH directions: an "
              "entry that triggers normalized (fast host) but not raw "
              "is NOT stale",
              rc == 0 and "STALE-ACCEPT" not in out
              and "CHANGED" in out, out)

        # --- cumulative drift (warn-only) ---
        rc, out = run(tmp, payload({"q1": 3.2, "q2": 2.0}),
                      payload({"q1": 1.8, "q2": 2.0}),
                      prev2=payload({"q1": 1.0, "q2": 2.0}))
        check("two sub-gate steps compounding past 2x vs N-2 warn "
              "CUMULATIVE without failing",
              rc == 0 and "CUMULATIVE" in out and "q1" in out, out)

        rc, out = run(tmp, payload({"q1": 1.2, "q2": 2.0}),
                      payload({"q1": 1.1, "q2": 2.0}),
                      prev2=payload({"q1": 1.0, "q2": 2.0}))
        check("no compounding drift reports clean",
              rc == 0 and "no compounding drift" in out, out)

        # --- min-of-pair hostcal under >20% within-run drift (r17) ---
        # base pair drifted 150 -> 210 (mean 180): mean-normalization
        # would shrink every threshold by 150/180 and flag a steady
        # 5.2x-raw query at >3x normalized... inverted: new/base mean
        # = 150/180 = 0.833 tightens thresholds; min-of-pair reads
        # 150/150 = 1.0. q1 grew 2.8x raw: under 3x at ratio 1.0,
        # flagged at 3x*0.833 = 2.5x under the poisoned mean.
        rc, out = run(tmp, payload({"q1": 5.6, "q2": 2.0},
                                   hostcal_par_ms=150.0,
                                   hostcal_par_ms_start=150.0,
                                   hostcal_par_ms_end=150.0),
                      payload({"q1": 2.0, "q2": 2.0},
                              hostcal_par_ms=180.0,
                              hostcal_par_ms_start=150.0,
                              hostcal_par_ms_end=210.0))
        check("a >20% drifted base pair normalizes by its MIN sample "
              "(a 2.8x grower stays under the 3x gate)",
              rc == 0 and "base pair drifted >20%" in out
              and "REGRESSION" not in out, out)

        # --- total-level creep tripwire (VERDICT r16 #2) ---
        # fleet-wide 1.2x: every query under the per-query cumulative
        # 2x, Σ over the shared set 12.0 vs 10.0 > 1.1x, hostcal flat
        flat = {"hostcal_ms": 1000.0}
        fleet_n = payload({f"q{i}": 2.4 for i in range(5)}, **flat)
        fleet_b = payload({f"q{i}": 2.35 for i in range(5)}, **flat)
        fleet_p2 = payload({f"q{i}": 2.0 for i in range(5)}, **flat)
        rc, out = run(tmp, fleet_n, fleet_b, prev2=fleet_p2)
        check("fleet-wide sub-gate creep (1.2x Σ, flat hostcal) trips "
              "TOTAL-CREEP exit 3 with zero per-query flags",
              rc == 3 and "TOTAL-CREEP" in out
              and "CUMULATIVE  " not in out, out)

        rc, out = run(tmp, payload({f"q{i}": 2.1 for i in range(5)},
                                   **flat),
                      fleet_b, prev2=fleet_p2)
        check("Σ growth under the creep bar passes and prints the "
              "total check",
              rc == 0 and "under the 1.1x creep bar" in out, out)

        # genuinely slower host (ratio 1.3, outside ±10%): Σ comparison
        # meaningless — tripwire must stay silent, per-query thresholds
        # already normalize
        rc, out = run(tmp, payload({f"q{i}": 2.6 for i in range(5)},
                                   hostcal_ms=1300.0),
                      payload({f"q{i}": 2.55 for i in range(5)},
                              hostcal_ms=1300.0),
                      prev2=fleet_p2)
        check("hostcal outside the ±10% band silences the creep "
              "tripwire",
              rc == 0 and "creep tripwire silent" in out
              and "TOTAL-CREEP" not in out, out)

        # payloads with NO hostcal must not be treated as 'flat within
        # band' — the fallback ratio 1.0 is an absence, not a reading
        rc, out = run(tmp, payload({f"q{i}": 2.4 for i in range(5)}),
                      payload({f"q{i}": 2.35 for i in range(5)}),
                      prev2=payload({f"q{i}": 2.0 for i in range(5)}))
        check("missing hostcal silences the creep tripwire",
              rc == 0 and "hostcal unavailable" in out
              and "TOTAL-CREEP" not in out, out)

        # an ACCEPTED definition change is excluded from both sums
        acc_n = payload({"q1": 4.0, "q2": 2.0, "q3": 2.0, "q4": 2.0},
                        **flat)
        acc_b = payload({"q1": 1.0, "q2": 2.0, "q3": 2.0, "q4": 2.0},
                        **flat)
        acc_p2 = payload({"q1": 1.0, "q2": 2.0, "q3": 2.0, "q4": 2.0},
                         **flat)
        rc, out = run(tmp, acc_n, acc_b, prev2=acc_p2,
                      accept_file=accept("q1", "definition changed",
                                         1.0))
        check("accepted definition change is excluded from the creep "
              "sums",
              rc == 0 and "TOTAL-CREEP" not in out
              and "CHANGED" in out, out)

    # PER-PASS EPISODE DISCOUNT (VERDICT r17 #2): contended-pass reps
    # are discounted via hostcal_par_ms_passes before flagging
    with tempfile.TemporaryDirectory() as tmp:
        flat = {"hostcal_ms": 250.0}
        # q1 regressed 1.0 -> 9.0 median, but rep 1 (pass 1) is the
        # inflated one and pass 1's hostcal sample says CONTENDED:
        # clean-pass median (reps 0, 2) = 1.1 — under the bar
        ep_new = payload({"q1": 9.0, "q2": 2.0}, **flat)
        ep_new["plain"] = {"q1": 9.0, "q2": 2.0}
        ep_new["spread"] = {"q1": 29.0, "q2": 0.01}
        ep_new["reps_s"] = {"q1": [1.0, 30.0, 1.2],
                            "q2": [2.0, 2.0, 2.0]}
        ep_new["reps"] = 3
        ep_new["hostcal_par_ms_passes"] = {"0": 150.0, "1": 600.0,
                                           "2": 155.0}
        ep_base = payload({"q1": 1.0, "q2": 2.0}, **flat)
        rc, out = run(tmp, ep_new, ep_base)
        check("contended-pass reps are discounted (no flag, "
              "EPISODE-DISCOUNTED printed)",
              rc == 0 and "EPISODE-DISCOUNTED" in out
              and "REGRESSION" not in out and "NOISY" not in out, out)

        # the same payload WITHOUT pass stamps must still flag
        ep_plain = dict(ep_new)
        ep_plain.pop("hostcal_par_ms_passes")
        rc, out = run(tmp, ep_plain, ep_base)
        check("without pass stamps the mover still flags",
              rc != 0 and "EPISODE-DISCOUNTED" not in out, out)

        # a REAL regression (all passes clean, all reps high) is NOT
        # discounted even with stamps present
        real = payload({"q1": 9.0, "q2": 2.0}, **flat)
        real["reps_s"] = {"q1": [9.0, 9.1, 8.9], "q2": [2.0, 2.0, 2.0]}
        real["reps"] = 3
        real["spread"] = {"q1": 0.2, "q2": 0.01}
        real["hostcal_par_ms_passes"] = {"0": 150.0, "1": 152.0,
                                         "2": 149.0}
        rc, out = run(tmp, real, ep_base)
        check("clean-pass real regression still flags",
              rc != 0 and "REGRESSION  q1" in out
              and "EPISODE-DISCOUNTED" not in out, out)

        # sub-gate noisy-adjudicate mover with a contended pass is
        # discounted too
        na_new = payload({"q1": 2.4, "q2": 2.0}, **flat)
        na_new["spread"] = {"q1": 5.0, "q2": 0.01}
        na_new["reps_s"] = {"q1": [1.05, 6.0, 1.0],
                            "q2": [2.0, 2.0, 2.0]}
        na_new["reps"] = 3
        na_new["hostcal_par_ms_passes"] = {"0": 150.0, "1": 700.0,
                                           "2": 148.0}
        rc, out = run(tmp, na_new, ep_base)
        check("noisy-adjudicate mover with contended pass is "
              "discounted",
              rc == 0 and "EPISODE-DISCOUNTED" in out
              and "NOISY-ADJUDICATE" not in out, out)

        # empty shared set prints its own message, not the hostcal-band
        # one (ADVICE r17)
        es_new = payload({"q1": 2.0}, **flat)
        es_base = payload({"q1": 2.0}, **flat)
        es_p2 = payload({"q1": 2.0}, **flat)
        rc, out = run(tmp, es_new, es_base, prev2=es_p2,
                      accept_file=accept("q1", "changed", 2.0))
        check("empty creep-shared set names its own cause",
              "no shared non-accepted queries" in out
              and "outside" not in out, out)

    if failures:
        print(f"== {len(failures)} self-test failure(s) ==")
        return 1
    print("== benchgate self-test: all pass ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
