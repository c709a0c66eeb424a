#!/usr/bin/env python3
"""Scale-leg gate: compare a staged N-times-scale bench payload against
the base-SF payload and fail any query whose wall grew superlinearly.

Usage: python3 scripts/scalegate.py SCALED.json BASE.json SCALE
         (SCALE = the data multiple between the two legs, e.g. 10)

A query is judged on wall_ratio = scaled_median / base_median,
host-normalized the same way benchgate normalizes (parallel hostcal leg
preferred, scalar fallback, clamped [0.5, 2.0]):

- ratio >= SCALE        -> SUPERLINEAR, exit 1. Wall grew at least as
  fast as the data; at 100 TB this query is a scale-killer.
- ratio >= 0.6 * SCALE  -> needs a documented output-growth note in
  scripts/scalegate_notes.json ({"query": {"reason": ...}}). With a
  note it prints NOTED (the growth is explained by the query's OUTPUT
  growing with the data — q224's wedge count growing 10x for 10x rows
  is the template); without one it prints WARN. Neither changes the
  exit code — the judged contract is fail-at-superlinear, document
  the 6x-10x band.
- a query that FAILED at scale (median < 0 or listed in "failed")
  is always exit 1: working-at-sf0.1 but dying at sf1 is the worst
  scale regression of all.

Stale notes WARN (deliberately weaker than benchgate_accept.json's
hard-fail, with measured cause): scale-leg ratios are single-run
readings, and the r14 builder host swings pin/shuffle-heavy queries
up to 3x between runs (its own parallel hostcal drifted 40% inside
one three-query run) — a hard-fail staleness would convert that host
noise into gate failures that flap across runs. A STALE-NOTE line is
pruning advice. The gate's teeth are elsewhere: a note can NEVER
excuse ratio >= SCALE (superlinear always fails), so a lingering note
pre-approves nothing that matters. Staleness also has HYSTERESIS: a
note is stale only below 0.8x the warn threshold.

A note may also carry focused steady-state evidence —
{"reason": ..., "focused_median_s": <s>, "reps": <n>, "date": "..."} —
which the gate prints next to NOTED so the single-run leg ratio is
adjudicated against committed multi-rep numbers, not prose.

REMEASURED (r16, mirrors benchgate): the scaled payload may carry
"remeasured": {"query": {"median": X, "full_run_median": Y,
"reps": N>=3}} — the published scale number was substituted with a
focused steady-state median after the leg's own reading was judged a
host episode (the r16 leg read q223 at 83s with a 60% within-run
parallel-hostcal drift; focused idle-host reps measured 15-29s). The
gate VALIDATES each entry (median must equal the published number,
full_run_median must be present to audit against, reps >= 3) and
exits 2 on malformation — an invalid substitution must never silently
gate. The full-run number stays in the artifact.

Exit codes: 0 pass (incl. warn/noted/stale), 1 superlinear or
failed-at-scale, 2 usage/malformed-remeasured.
"""
import json
import os
import sys

NOTES_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scalegate_notes.json")
HOSTCAL_CLAMP = (0.5, 2.0)
WARN_FRACTION = 0.6


def load(path):
    d = json.load(open(path))
    if "queries" not in d:
        d = d.get("parsed") or {}
    if "plain" not in d:
        sys.exit(f"{path}: no full bench payload (need 'plain' medians)")
    return d


def medians(d):
    return {**d["queries"], **d.get("plain", {})}


def effective_hostcal(d, key):
    """Mirror of benchgate.effective_hostcal: the published hostcal is
    the mean of a before/after pair; when the pair drifts >20% the mean
    is contention-poisoned (contention only inflates samples), so the
    MIN of the pair is the intrinsic-speed estimate. r17 incident: a
    base leg whose pair drifted 157.9 -> 205.8 ms pushed two steady
    ~9.1-9.4x output-growth queries over the 10x superlinear bar purely
    through the inflated mean. Returns (value, adjusted_bool)."""
    v = d.get(key)
    s, e = d.get(f"{key}_start"), d.get(f"{key}_end")
    if v and s and e and min(s, e) > 0 and max(s, e) / min(s, e) > 1.2:
        return min(s, e), True
    return v, False


def hostcal_ratio(scaled, base):
    for key, leg in (("hostcal_par_ms", "hostcal_par"),
                     ("hostcal_ms", "hostcal")):
        (hn, an), (hb, ab) = (effective_hostcal(scaled, key),
                              effective_hostcal(base, key))
        if hn and hb:
            raw = hn / hb
            lo, hi = HOSTCAL_CLAMP
            r = min(max(raw, lo), hi)
            adj = "".join(
                f" [{side} pair drifted >20% — using min sample]"
                for side, a in (("scaled", an), ("base", ab)) if a)
            print(f"{leg}: scaled {hn:.0f} ms / base {hb:.0f} ms = "
                  f"{raw:.3f}"
                  + (f" (clamped {r:.3f})" if r != raw else "")
                  + adj + " — ratios normalized")
            return r
    print("hostcal unavailable on one side — raw ratios")
    return 1.0


def main() -> int:
    if len(sys.argv) != 4:
        print(__doc__)
        return 2
    scaled = load(sys.argv[1])
    base = load(sys.argv[2])
    scale = float(sys.argv[3])
    if scale <= 1:
        print(f"SCALE must be > 1, got {scale}")
        return 2
    warn_at = WARN_FRACTION * scale

    notes = {}
    if os.path.exists(NOTES_FILE):
        notes = json.load(open(NOTES_FILE))
        for name, e in notes.items():
            if not (isinstance(e, dict) and "reason" in e):
                print(f"notes entry {name!r} must be "
                      f'{{"reason": ...}}')
                return 2

    sq, bq = medians(scaled), medians(base)

    rem = scaled.get("remeasured", {})
    rem_bad = []
    if not isinstance(rem, dict):
        rem_bad.append(f"remeasured must be an object, "
                       f"got {type(rem).__name__}")
        rem = {}
    for name in sorted(rem):
        e = rem[name]
        if not isinstance(e, dict):
            rem_bad.append(f"remeasured[{name}]: must be an object")
            continue
        med, full, reps = (e.get("median"), e.get("full_run_median"),
                           e.get("reps"))
        print(f"REMEASURED  {name}: full-run {full}s substituted with "
              f"focused median {med}s (reps={reps})")
        if full is None:
            rem_bad.append(f"remeasured[{name}]: missing "
                           f"full_run_median — nothing to audit against")
        if not isinstance(reps, int) or reps < 3:
            rem_bad.append(f"remeasured[{name}]: reps={reps!r} < 3 — a "
                           f"substitution must itself be a >=3-rep median")
        pub = sq.get(name)
        if med is None or pub is None or abs(pub - med) > 1e-9:
            rem_bad.append(f"remeasured[{name}]: substituted median "
                           f"{med} does not match published number {pub}")
    if rem_bad:
        for b in rem_bad:
            print(f"MALFORMED  {b}")
        print(f"== SCALEGATE MALFORMED: {len(rem_bad)} remeasured "
              f"violation(s) ==")
        return 2

    host = hostcal_ratio(scaled, base)

    failed = set(scaled.get("failed", []))
    failed |= {k for k, v in sq.items() if v is None or v < 0}

    bad, warned, noted = [], [], []
    compared = 0
    for name in sorted(sq):
        if name in failed:
            bad.append(f"FAILED-AT-SCALE  {name}: ran at base SF but "
                       f"failed at {scale:g}x")
            continue
        b = bq.get(name)
        if b is None:
            print(f"no base number for {name} — skipped")
            continue
        compared += 1
        ratio = (sq[name] / b) / host if b > 0 else float("inf")
        line = (f"{name}: {b:.2f}s -> {sq[name]:.2f}s = {ratio:.2f}x "
                f"wall for {scale:g}x data")
        if ratio >= scale:
            bad.append(f"SUPERLINEAR  {line}")
        elif ratio >= warn_at:
            if name in notes:
                noted.append(name)
                e = notes[name]
                focus = ""
                if "focused_median_s" in e:
                    focus = (f" [focused: {e['focused_median_s']:g}s "
                             f"median of {e.get('reps', '?')} reps, "
                             f"{e.get('date', '?')}]")
                print(f"NOTED  {line} — {e['reason']}{focus}")
            else:
                warned.append(name)
                print(f"WARN  {line} — document the output growth in "
                      f"{os.path.basename(NOTES_FILE)} or fix it")
        else:
            print(f"OK  {line}")

    stale = [n for n in sorted(notes)
             if n not in failed
             and not (n in sq and bq.get(n)
                      and (sq[n] / bq[n]) / host >= 0.8 * warn_at)]
    for n in stale:
        print(f"STALE-NOTE  {n}: no longer in the warn band (or not "
              f"measured) — consider pruning from "
              f"{os.path.basename(NOTES_FILE)} (warn-only: see header)")

    for b in bad:
        print(b)
    if bad:
        print(f"== SCALEGATE FAIL: {len(bad)} scale regression(s) "
              f"over {compared} compared ==")
        return 1
    print(f"== SCALEGATE PASS: {compared} compared at {scale:g}x "
          f"({len(noted)} noted, {len(warned)} warned, "
          f"{len(stale)} stale note(s)) ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
