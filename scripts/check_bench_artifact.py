#!/usr/bin/env python3
"""Pre-commit guard for bench_out.json: refuse to let a focused/smoke
artifact be committed as the round's bench (r12's end-of-round snapshot
commit replaced the 290-query run with a 1-query sf0.001 smoke artifact
— it carried 'plain' and no truncation marker, so benchgate would have
accepted it as a baseline and silently gated 1/290 queries).

Usage: python3 scripts/check_bench_artifact.py [bench_out.json]
Exit 0 only when the payload is full and self-consistent:
  - parses, has 'queries' + 'plain' and no truncation marker
  - carries n_registry and covers EXACTLY that many queries
  - total 'value' > 0 and sf points at a real directory string

Run this BEFORE any `git add bench_out.json` — it is the snapshot-recipe
check VERDICT r12 #1 asked for (benchgate also refuses such payloads at
gate time; this catches them at commit time).

Since r16 it also refuses (VERDICT r15 #1/#3/#7):
  - a payload whose `git_sha` stamp is not the current HEAD, or that
    was measured on a dirty tree (`git_dirty`) — the committed r15
    bench carried a pre-fix number for the very query that round fixed;
    `--allow-sha-mismatch` is the explicit escape for cross-checking
    historical artifacts.
  - a payload that self-declares contention: `preflight_contended`
    true, or within-run parallel-hostcal drift
    |start-end|/min > 50% (the r15 driver leg drifted 115%).
"""
import json
import os
import subprocess
import sys


def head_sha(path):
    try:
        return subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(path)) or ".",
             "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        return None


def code_differs(path, sha):
    """True when src/build.sbt differ between the stamped SHA and HEAD
    (or the SHA is unknown to this repo). SHA equality alone is the
    wrong contract: committing the artifact itself advances HEAD past
    the stamp — what must hold is that the artifact measured the CODE
    at HEAD, not the commit hash."""
    r = subprocess.run(
        ["git", "-C", os.path.dirname(os.path.abspath(path)) or ".",
         "diff", "--quiet", sha, "HEAD", "--", "src", "build.sbt"],
        capture_output=True, text=True)
    return r.returncode != 0


def main() -> int:
    flags = {"--allow-sha-mismatch", "--allow-unstamped"}
    args = [a for a in sys.argv[1:] if a not in flags]
    allow_sha = "--allow-sha-mismatch" in sys.argv
    allow_unstamped = "--allow-unstamped" in sys.argv
    path = args[0] if args else "bench_out.json"
    try:
        d = json.load(open(path))
    except Exception as e:
        print(f"{path}: unreadable ({e})")
        return 1
    problems = []
    if "queries" not in d or "plain" not in d:
        problems.append("missing 'queries'/'plain' — not a full payload")
    if "queries_truncated_to_slowest" in d:
        problems.append("compact slowest-N stdout payload, not the file")
    reg = d.get("n_registry")
    nq = len(d.get("queries", {}))
    if reg is None:
        problems.append("no n_registry — re-run graft.Bench (it emits "
                        "the registry size since r13)")
    elif nq != reg:
        problems.append(f"covers {nq}/{reg} registered queries — a "
                        f"focused/smoke run must not be committed as "
                        f"the round bench")
    if not d.get("value") or d["value"] <= 0:
        problems.append(f"total value {d.get('value')} — empty run?")
    if d.get("failed"):
        problems.append(f"failed queries present: {d['failed']}")
    sha = d.get("git_sha")
    # Unknown/missing sha is a REFUSE, not a skip (ADVICE r17 /
    # VERDICT r17 #3): a clean-but-unstamped payload used to pass with
    # zero code anchoring — exactly the class the dirty/sha refusals
    # exist for. Bench now carries a build-manifest fallback, so a
    # repo-built classpath can never stamp unknown; --allow-unstamped
    # is the explicit escape for historical artifacts only.
    if (not sha or sha == "unknown") and not allow_unstamped:
        problems.append("git_sha missing/\"unknown\" — un-anchorable "
                        "payload; rebuild (Bench bakes a build-manifest "
                        "sha since r18) or pass --allow-unstamped for "
                        "a historical artifact")
    if sha and sha != "unknown" and not allow_sha:
        head = head_sha(path)
        if head and sha != head and code_differs(path, sha):
            problems.append(f"git_sha {sha[:12]}: src/build.sbt differ "
                            f"between the stamped commit and HEAD "
                            f"{head[:12]} — the artifact measures "
                            f"different code; re-run graft.Bench at "
                            f"HEAD (--allow-sha-mismatch to override)")
    # Dirty-tree refusal is NOT waived by --allow-sha-mismatch (ADVICE
    # r16: the flag is an escape for historical-SHA artifacts only; a
    # dirty-tree artifact is un-anchorable regardless of the stamp).
    if d.get("git_dirty"):
        problems.append("measured on a DIRTY tree (git_dirty) — "
                        "the code it timed is not anchorable to any "
                        "commit")
    if d.get("preflight_contended"):
        problems.append(f"pre-flight declared the host CONTENDED "
                        f"(preflight_par_ms={d.get('preflight_par_ms')}) "
                        f"— re-run on an idle host")
    ps, pe = d.get("hostcal_par_ms_start"), d.get("hostcal_par_ms_end")
    if ps and pe and abs(ps - pe) / min(ps, pe) > 0.5:
        problems.append(f"within-run parallel-hostcal drift "
                        f"{ps:.0f}->{pe:.0f} ms (>50%) — self-declared "
                        f"contended leg, not a round artifact")
    if problems:
        for p in problems:
            print(f"REFUSE {path}: {p}")
        return 1
    print(f"OK {path}: {nq}/{reg} queries, total {d['value']:.1f}s, "
          f"sf={d.get('sf')}, hostcal_ms={d.get('hostcal_ms')}, "
          f"hostcal_par_ms={d.get('hostcal_par_ms')}, "
          f"git_sha={(d.get('git_sha') or 'unstamped')[:12]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
