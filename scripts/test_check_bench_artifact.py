#!/usr/bin/env python3
"""Self-test for the bench-artifact pre-commit guard (same contract as
test_benchgate: the guard only protects the round artifact if its own
refusals are pinned — VERDICT r15 #1/#3/#7 asked for one self-test per
new check).

Run: python3 scripts/test_check_bench_artifact.py   (exit 0 = all pass)
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
GUARD = os.path.join(HERE, "check_bench_artifact.py")


def head_sha():
    return subprocess.run(["git", "-C", HERE, "rev-parse", "HEAD"],
                          capture_output=True, text=True,
                          check=True).stdout.strip()


def payload(**extra):
    qs = {f"q{i}": 1.0 for i in range(5)}
    d = {"metric": "total", "value": 5.0, "unit": "sec", "queries": qs,
         "plain": dict(qs), "failed": [], "n_registry": 5,
         "hostcal_ms": 250.0, "hostcal_par_ms": 150.0,
         "hostcal_par_ms_start": 150.0, "hostcal_par_ms_end": 150.0,
         "sf": "/root/testdata/sf0.1"}
    d.update(extra)
    return d


def run(d, *flags, in_repo=True):
    # artifacts written inside the repo see HEAD; a tmp-dir artifact
    # has no surrounding git repo (sha check is best-effort skipped)
    where = HERE if in_repo else tempfile.mkdtemp()
    p = os.path.join(where, "test_artifact_tmp.json")
    with open(p, "w") as f:
        json.dump(d, f)
    try:
        r = subprocess.run([sys.executable, GUARD, p, *flags],
                           capture_output=True, text=True)
        return r.returncode, r.stdout + r.stderr
    finally:
        os.remove(p)


def main():
    sha = head_sha()
    failures = []

    def check(name, want_rc, rc, out, want_text=None):
        ok = rc == want_rc and (want_text is None or want_text in out)
        print(("PASS" if ok else "FAIL"), name)
        if not ok:
            failures.append(name)
            print(f"  rc={rc} (want {want_rc}); out:\n{out}")

    rc, out = run(payload(git_sha=sha, git_dirty=False))
    check("clean HEAD-stamped artifact passes", 0, rc, out)

    # pre-r18 this passed ("unstamped artifact still passes"); since
    # the r18 unknown-sha refusal, a legacy unstamped payload needs the
    # explicit flag
    rc, out = run(payload(), "--allow-unstamped")
    check("unstamped (pre-r16) artifact passes only with "
          "--allow-unstamped", 0, rc, out)

    rc, out = run(payload(git_sha="0" * 40, git_dirty=False))
    check("unknown/stale git_sha refused", 1, rc, out,
          "measures different code")

    # a prior commit that does NOT touch src/build.sbt must pass: the
    # stamp contract is measured-code == HEAD-code, not sha == HEAD
    # (committing the artifact itself advances HEAD past the stamp)
    prev = subprocess.run(
        ["git", "-C", HERE, "log", "--format=%H",
         "--max-count=8", "HEAD~1"],
        capture_output=True, text=True).stdout.split()
    same_code = None
    for c in prev:
        r = subprocess.run(["git", "-C", HERE, "diff", "--quiet", c,
                            "HEAD", "--", "src", "build.sbt"],
                           capture_output=True)
        if r.returncode == 0:
            same_code = c
            break
    if same_code:
        rc, out = run(payload(git_sha=same_code, git_dirty=False))
        check("ancestor stamp with identical src/build.sbt passes",
              0, rc, out)
    else:
        print("SKIP ancestor-stamp test (no recent commit with "
              "identical src)")

    rc, out = run(payload(git_sha="0" * 40, git_dirty=False),
                  "--allow-sha-mismatch")
    check("--allow-sha-mismatch overrides for historical artifacts",
          0, rc, out)

    rc, out = run(payload(git_sha=sha, git_dirty=True))
    check("dirty-tree artifact refused", 1, rc, out, "DIRTY")

    # ADVICE r16: the dirty refusal was nested under the sha check, so
    # --allow-sha-mismatch silently waived it too; the flag is an
    # escape for HISTORICAL-SHA artifacts only
    rc, out = run(payload(git_sha="0" * 40, git_dirty=True),
                  "--allow-sha-mismatch")
    check("--allow-sha-mismatch does NOT waive the dirty-tree refusal",
          1, rc, out, "DIRTY")

    rc, out = run(payload(git_sha=sha, preflight_contended=True,
                          preflight_par_ms=480.0))
    check("pre-flight-contended artifact refused", 1, rc, out,
          "CONTENDED")

    rc, out = run(payload(git_sha=sha, hostcal_par_ms_start=294.7,
                          hostcal_par_ms_end=137.1))
    check("within-run par-hostcal drift >50% refused (r15 driver leg)",
          1, rc, out, "drift")

    rc, out = run(payload(git_sha=sha, hostcal_par_ms_start=160.0,
                          hostcal_par_ms_end=150.0))
    check("small within-run drift passes", 0, rc, out)

    # the pre-r16 refusals must still hold
    d = payload(git_sha=sha)
    d["queries"] = {"q0": 1.0}
    rc, out = run(d)
    check("focused run (queries < n_registry) still refused", 1, rc,
          out, "focused/smoke")

    rc, out = run(payload(git_sha=sha, failed=["q3"]))
    check("failed queries still refused", 1, rc, out, "failed")

    # ADVICE r17 / VERDICT r17 #3: git_sha missing/"unknown" used to
    # SKIP all provenance checks — a clean-but-unstamped payload got
    # "OK" with zero code anchoring
    rc, out = run(payload(git_sha="unknown", git_dirty=False))
    check("sha=\"unknown\" payload refused", 1, rc, out, "unknown")

    d = payload(git_sha=sha)
    del d["git_sha"]
    rc, out = run(d)
    check("missing-sha payload refused", 1, rc, out, "unknown")

    rc, out = run(payload(git_sha="unknown", git_dirty=False),
                  "--allow-unstamped")
    check("--allow-unstamped overrides for historical artifacts",
          0, rc, out)

    print(f"== {'FAIL: ' + ', '.join(failures) if failures else 'all pass'} ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
