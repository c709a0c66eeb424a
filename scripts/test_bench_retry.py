#!/usr/bin/env python3
"""Self-test for the bench retry wrapper (same contract as the other
gate self-tests: the loop only replaces the manual ritual if its own
behaviors are pinned — VERDICT r16 #5 asked for script + self-test).

Uses a fake bench (shell counter file) so no Spark is involved.

Run: python3 scripts/test_bench_retry.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
WRAP = os.path.join(HERE, "bench_retry.py")


def fake_bench(tmp, fail_first_n, then_rc=0, preflight=480.0):
    """A script that exits 4 (printing the bench's pre-flight stamp to
    stderr) for its first `fail_first_n` invocations, then `then_rc`.
    Also asserts the wrapper forced SPARK_GRAFT_BENCH_PREFLIGHT=abort.
    """
    counter = os.path.join(tmp, "count")
    script = os.path.join(tmp, "fake_bench.sh")
    with open(script, "w") as f:
        f.write(f"""#!/bin/sh
[ "$SPARK_GRAFT_BENCH_PREFLIGHT" = "abort" ] || {{ echo "env not forced" >&2; exit 99; }}
n=$(cat {counter} 2>/dev/null || echo 0)
n=$((n+1)); echo $n > {counter}
if [ $n -le {fail_first_n} ]; then
  echo "[bench] preflight hostcal_par_ms={preflight} (threshold 250) CONTENDED" >&2
  exit 4
fi
echo "[bench] preflight hostcal_par_ms=150.0 (threshold 250)" >&2
exit {then_rc}
""")
    os.chmod(script, 0o755)
    return script


def run(tmp, script, attempts, sleep="0.01"):
    # the give-up stamp is repo-anchored since r18 (ADVICE r17: a CWD
    # stamp written from /tmp was one the round tooling never saw) —
    # sandbox it into tmp so self-tests never touch the repo root
    env = dict(os.environ, SPARK_GRAFT_GIVEUP_DIR=tmp)
    return subprocess.run(
        [sys.executable, WRAP, f"--attempts={attempts}",
         f"--sleep={sleep}", "--", script],
        capture_output=True, text=True, cwd=tmp, env=env)


def main():
    failures = []

    def check(name, cond, detail=""):
        print(("PASS " if cond else "FAIL ") + name)
        if not cond:
            failures.append(f"{name}: {detail}")

    with tempfile.TemporaryDirectory() as tmp:
        r = run(tmp, fake_bench(tmp, 0), attempts=3)
        check("clean first attempt exits 0 without retrying",
              r.returncode == 0 and "attempt 1/3" in r.stderr
              and "attempt 2/3" not in r.stderr, r.stderr)

    with tempfile.TemporaryDirectory() as tmp:
        r = run(tmp, fake_bench(tmp, 2), attempts=5)
        check("two contended attempts then clean exits 0 on the third",
              r.returncode == 0 and "attempt 3/5" in r.stderr
              and "clean leg on attempt 3" in r.stderr, r.stderr)
        check("no give-up stamp on eventual success",
              not os.path.exists(os.path.join(
                  tmp, "bench_retry_giveup.json")))

    with tempfile.TemporaryDirectory() as tmp:
        r = run(tmp, fake_bench(tmp, 99), attempts=2)
        stamp = os.path.join(tmp, "bench_retry_giveup.json")
        ok = r.returncode == 4 and os.path.exists(stamp)
        d = json.load(open(stamp)) if ok else {}
        check("all-contended gives up with exit 4 and a stamp "
              "preserving every pre-flight reading",
              ok and d.get("gave_up") and d.get("attempts") == 2
              and len(d.get("readings", [])) == 2
              and all(x["preflight_par_ms"] == 480.0
                      for x in d["readings"]),
              r.stderr + json.dumps(d))

    with tempfile.TemporaryDirectory() as tmp:
        r = run(tmp, fake_bench(tmp, 0, then_rc=7), attempts=5)
        check("a non-contention failure propagates immediately "
              "(never retried into a pass)",
              r.returncode == 7 and "attempt 2/5" not in r.stderr
              and "REAL failure rc=7" in r.stderr, r.stderr)

    # ADVICE r17: `--` with nothing after it is a usage error, not a
    # Popen crash
    with tempfile.TemporaryDirectory() as tmp:
        r = subprocess.run([sys.executable, WRAP, "--"],
                           capture_output=True, text=True, cwd=tmp)
        check("empty post-`--` command is a usage error (exit 2)",
              r.returncode == 2 and "Usage" in r.stdout + r.stderr
              or r.returncode == 2 and "usage" in
              (r.stdout + r.stderr).lower(), r.stdout + r.stderr)

    if failures:
        print(f"== {len(failures)} self-test failure(s) ==")
        return 1
    print("== bench_retry self-test: all pass ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
