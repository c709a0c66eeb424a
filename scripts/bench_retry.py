#!/usr/bin/env python3
"""Bounded retry wrapper for the bench leg (VERDICT r16 #5): the
pre-flight gate kills a contended leg in ~35 s (exit 4), but the
documented "rerun on exit 4, sleep ~100 s" ritual was manual, so
contended driver legs kept landing in the working tree. This wrapper
makes the loop tooling:

  - runs the bench command with SPARK_GRAFT_BENCH_PREFLIGHT=abort
    forced into its environment (warn-and-stamp mode would defeat the
    retry: the run would burn the full leg and stamp contended)
  - exit 4 (pre-flight contended)  -> sleep (exponential, capped) and
    retry, up to --attempts
  - exit 0                         -> done
  - any other exit                 -> REAL failure, propagated
    immediately (a crash must never be retried into a pass)
  - all attempts contended         -> exit 4 and write
    bench_retry_giveup.json preserving every attempt's pre-flight
    reading (parsed from the bench's own stderr stamp), so a contended
    afternoon leaves an explicit give-up artifact, never a silent
    clobber or a missing leg.

Usage:
  python3 scripts/bench_retry.py [--attempts=N] [--sleep=S]
                                 [--max-sleep=S] [-- CMD ...]

Without an explicit CMD it builds the standard sbt-free invocation
(java -cp /opt/spark/jars/*:<repo>/target/scala-2.13/classes
graft.Bench) with the add-opens set from build.sbt; env knobs
(SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, ...) pass through. Defaults:
5 attempts, first sleep 100 s, doubling, capped at 600 s.
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# mirrors jdk17AddOpens in build.sbt (sbt-free runs need it verbatim)
ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]

PREFLIGHT_RE = re.compile(
    r"preflight hostcal_par_ms=([0-9.]+)")


def default_cmd(extra_args):
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            f"-Xmx{os.environ.get('SPARK_DRIVER_MEM', '8g')}",
            "-cp", f"/opt/spark/jars/*:{REPO}/target/scala-2.13/classes",
            "graft.Bench"] + extra_args
    return cmd


def run_attempt(cmd):
    """Run one attempt, teeing stderr (the pre-flight stamp lives
    there) while keeping stdout attached so the bench JSON line lands
    where the caller expects it. Returns (rc, preflight_ms|None)."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_PREFLIGHT"] = "abort"
    p = subprocess.Popen(cmd, stderr=subprocess.PIPE, text=True,
                         env=env)
    preflight = None
    for line in p.stderr:
        sys.stderr.write(line)
        m = PREFLIGHT_RE.search(line)
        if m:
            preflight = float(m.group(1))
    return p.wait(), preflight


def main() -> int:
    attempts, sleep_s, max_sleep = 5, 100.0, 600.0
    args = sys.argv[1:]
    cmd = None
    if "--" in args:
        i = args.index("--")
        cmd = args[i + 1:]
        args = args[:i]
    for a in args:
        if a.startswith("--attempts="):
            attempts = int(a.split("=", 1)[1])
        elif a.startswith("--sleep="):
            sleep_s = float(a.split("=", 1)[1])
        elif a.startswith("--max-sleep="):
            max_sleep = float(a.split("=", 1)[1])
        else:
            print(__doc__)
            return 2
    if cmd is not None and not cmd:
        # ADVICE r17: `bench_retry.py --` with nothing after the
        # separator crashed in Popen with a raw error instead of usage
        print(__doc__)
        return 2
    if cmd is None:
        cmd = default_cmd([])
    readings = []
    for i in range(1, attempts + 1):
        print(f"[bench-retry] attempt {i}/{attempts}: "
              f"{' '.join(cmd[:1] + cmd[-2:])}", file=sys.stderr)
        rc, preflight = run_attempt(cmd)
        readings.append({"attempt": i, "rc": rc,
                         "preflight_par_ms": preflight,
                         "epoch_s": round(time.time(), 1)})
        if rc == 0:
            print(f"[bench-retry] clean leg on attempt {i}"
                  + (f" (preflight {preflight} ms)" if preflight
                     else ""), file=sys.stderr)
            return 0
        if rc != 4:
            print(f"[bench-retry] REAL failure rc={rc} — not a "
                  f"contention abort, not retrying", file=sys.stderr)
            return rc
        if i < attempts:
            wait = min(sleep_s * (2 ** (i - 1)), max_sleep)
            print(f"[bench-retry] contended "
                  f"(preflight {preflight} ms); sleeping {wait:.0f} s",
                  file=sys.stderr)
            time.sleep(wait)
    giveup = {"gave_up": True, "attempts": attempts,
              "readings": readings, "cmd": cmd,
              "note": "every attempt pre-flight-contended; no bench "
                      "artifact was produced (abort mode exits before "
                      "writing) — this stamp is the leg's record"}
    # repo-anchored, not CWD (ADVICE r17): legs run from /tmp by ritual,
    # and a give-up stamp written there is one the round tooling never
    # sees ($SPARK_GRAFT_GIVEUP_DIR overrides — the self-test sandboxes
    # it)
    giveup_path = os.path.join(
        os.environ.get("SPARK_GRAFT_GIVEUP_DIR", REPO),
        "bench_retry_giveup.json")
    with open(giveup_path, "w") as f:
        json.dump(giveup, f, indent=1)
    print(f"[bench-retry] GIVE-UP after {attempts} contended attempts; "
          f"stamp written to bench_retry_giveup.json", file=sys.stderr)
    return 4


if __name__ == "__main__":
    sys.exit(main())
