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
"""
import json
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
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
    if problems:
        for p in problems:
            print(f"REFUSE {path}: {p}")
        return 1
    print(f"OK {path}: {nq}/{reg} queries, total {d['value']:.1f}s, "
          f"sf={d.get('sf')}, hostcal_ms={d.get('hostcal_ms')}, "
          f"hostcal_par_ms={d.get('hostcal_par_ms')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
