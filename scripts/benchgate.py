#!/usr/bin/env python3
"""Bench regression gate: diff a fresh bench JSON against the previous
round's committed numbers and FAIL on any query whose median grew >3x —
the net that would have caught q209 shipping at 69 s (nothing compared
it to anything).

Usage: python3 scripts/benchgate.py NEW.json BASE.json [factor]
         [--accept=name,name,...] [--prev2=OLDER.json]

HOSTCAL NORMALIZATION: when BOTH payloads carry a calibration leg, the
growth threshold is scaled by new_hostcal/base_hostcal (clamped to
[0.5, 2.0] so a corrupt calibration can never neuter the gate): a host
that measures 15% slower on a fixed workload is allowed 15% more on
every query before the 3x trips. The 32-task PARALLEL leg
("hostcal_par_ms") is PREFERRED when both sides carry it — the bench is
local[32] and the r13/r14 evidence is that driver-vs-builder skew lives
in the contended parallel regime while the scalar leg stays flat (r13:
parallel drifted 30% on a run whose scalar moved 1.5%); the scalar
"hostcal_ms" leg is the fallback for payloads predating r13. Whichever
leg drives the thresholds, the other is printed informationally. Both
the raw and normalized ratios are printed for every flagged query.
Rounds 9/10/11 each burned manual adjudication effort on exactly this
host-noise pattern; the calibration was recorded but unused.

CONTENTION SELF-DECLARATION (warn-only): Bench records the parallel
calibration before and after the run ("hostcal_par_ms_start"/"_end").
A payload whose own two samples disagree by >20% measured a host whose
parallel capacity changed mid-run (r13: the driver's leg drifted
182.8 -> 134.6 ms and nothing flagged the 336.5 s total as contended).
The gate prints a CONTENDED warning for any such payload — never an
exit-code change, but a reader of the log knows to treat that side's
totals as context and trust only the per-query medians.

Accepted definition changes live IN-REPO at scripts/benchgate_accept.json
— each entry MUST be {"query_name": {"reason": "...", "baseline_median":
<the BASE file's median for that query>}}. A bare-string entry is a
usage error. The recorded median pins the entry to the one baseline it
was written against: if the BASE file's median no longer matches
(baseline moved on), or the entry no longer triggers the growth check
(absorbed), the entry is STALE and the gate FAILS (exit 1) until it is
pruned — a stale acceptance must never silently pre-approve a future
genuine regression on the same query. --accept=name,... still works for
ad-hoc additions (unpinned, current run only).

REMEASURED PROTOCOL (machine-checked): a committed bench may substitute
a focused idle-host median for a known-contended full-run sample, with
the substitution recorded under "remeasured": {"query": {"median": X,
"full_run_median": Y, "reps": N}}. The gate prints every entry and
REFUSES (exit 2) a NEW payload whose remeasured entries are malformed:
missing full_run_median (nothing to audit the substitution against),
reps < 3 (not a median), or a substituted median that does not match
the published number — so an optimistic substitution can't hide.

CUMULATIVE DRIFT (warn-only): --prev2=OLDER.json also compares NEW
against the round-before-last: a query that grew under the per-round
gate twice in a row (q142: 2.48 -> 3.75 -> 5.10, each step < 3x, total
2.06x) prints a CUMULATIVE warning at >2x vs the N-2 baseline. Never
changes the exit code — it exists to surface compounding sub-gate drift
for adjudication, not to gate on two-round-old numbers.

TOTAL-CREEP (exit 3, needs --prev2): Σ medians over the shared
(non-failed, non-accepted) query set grew >10% vs N-2 while the
normalized hostcal sits within ±10% — fleet-wide drift no per-query
threshold ever sees (VERDICT r16: 338 -> 383 s over two rounds, 83/290
queries faster, zero per-query flags). Adjudicate with one full
preflight-clean idle-host leg: reproduces ⇒ real, bisect; doesn't ⇒
commit the clean leg. Hostcal ratio outside the band silences the
check (the sum comparison is meaningless across genuinely different
host speeds).

A >factor growth whose NEW spread exceeds its NEW median is reported as
NOISY and is a MANDATORY-RERUN failure (exit 3, distinct from the
regression exit 1): a contended host can triple a median without any
plan change, but "noisy" must never read as "passed" — re-run the named
queries on an idle host and gate on that. The comparison prefers the
"plain" per-query medians when both files carry them (best-3 published
numbers are not comparable to plain-median baselines). Queries present
on only one side are listed informationally.

NOISY-ADJUDICATE (also exit 3): a query BELOW the hard gate but >2x
host-normalized whose own spread exceeds half its median self-declares
"this median is one rep wide" — r14's q78 passed at 2.17x with a
13.8 s spread on a 14.6 s median and cost a round of manual
adjudication. The gate now reads the spread the artifact already
carries: adjudicate such movers with a committed focused steady-state
artifact (the remeasured protocol is the escape hatch — a valid
"remeasured" entry for the query IS the adjudication and exempts it).

Exit codes: 0 pass, 1 regression(s)/stale-accept, 2 usage/malformed,
3 noisy-rerun-required.
"""
import json
import os
import sys

ACCEPT_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchgate_accept.json")

CUMULATIVE_FACTOR = 2.0
TOTAL_CREEP_FACTOR = 1.10      # Σ-medians growth vs N-2 that trips
TOTAL_CREEP_HOSTCAL_BAND = 0.10  # only with hostcal ratio within ±this
HOSTCAL_CLAMP = (0.5, 2.0)
NOISY_ADJ_FACTOR = 2.0        # normalized growth that opens the check
NOISY_ADJ_SPREAD_FRAC = 0.5   # spread/median that declares the median noisy
PASS_CONTENTION_FACTOR = 1.5  # pass hostcal_par > this x min(passes)
                              # marks that pass's reps as contended


def clean_pass_median(new, name):
    """Median of a query's base-pass reps restricted to CLEAN passes,
    using the artifact's per-pass parallel-hostcal stamps
    (`hostcal_par_ms_passes`, VERDICT r17 #2: Bench samples the 32-task
    calibration after every pass, so a mid-run contention episode is
    machine-visible instead of a per-round focused-leg ritual).

    A pass is contended when its sample exceeds PASS_CONTENTION_FACTOR
    x the run's fastest pass — contention only ever inflates the
    calibration, so the min is the intrinsic-speed estimate (the
    min-of-pair hostcal rationale applied per pass). Returns the
    median over the >= 2 clean-pass reps, or None when the artifact
    carries no stamps, no pass is contended (nothing to discount), or
    fewer than 2 clean reps remain. Only the base passes are used:
    rep i maps to pass i for i < reps by the rep-major protocol;
    adaptive-extra reps have query-dependent pass membership and are
    left out of the discount."""
    passes = new.get("hostcal_par_ms_passes") or {}
    rs = (new.get("reps_s") or {}).get(name)
    nbase = int(new.get("reps") or 0)
    if not passes or not rs or nbase < 2 or len(rs) < nbase:
        return None
    samples = [passes.get(str(i)) for i in range(nbase)]
    if any(s is None or s <= 0 for s in samples):
        return None
    floor_ms = min(samples)
    clean = [rs[i] for i in range(nbase)
             if samples[i] <= floor_ms * PASS_CONTENTION_FACTOR]
    if len(clean) == nbase or len(clean) < 2:
        return None
    s = sorted(clean)
    k = len(s)
    return s[k // 2] if k % 2 else (s[k // 2 - 1] + s[k // 2]) / 2


def load_bench(path):
    d = json.load(open(path))
    # BENCH_r{N}.json wraps the bench line under "parsed" (None when
    # the driver's stdout tail truncated — use bench_out.json then)
    if "queries" not in d:
        d = d.get("parsed") or {}
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' payload (truncated capture? "
                 f"use bench_out.json)")
    # Bench's COMPACT stdout line carries only the slowest-25 queries
    # and no 'plain'/'spread' — gating on it would silently compare
    # 25/275 queries and disable noisy detection. Refuse it.
    if "queries_truncated_to_slowest" in d or "plain" not in d:
        sys.exit(f"{path}: truncated/compact bench payload "
                 f"(slowest-{d.get('queries_truncated_to_slowest')} "
                 f"only) — gate on the full bench_out.json instead")
    d["_path"] = path
    return d


def coverage_violations(payloads):
    """UNDER-COVERAGE refusal (r12: an end-of-round snapshot committed a
    1-query sf0.001 smoke artifact that carried 'plain' and no truncation
    marker, so this gate would have accepted it as a 1/290 baseline).
    Two nets: (1) Bench emits "n_registry" — the FULL query-registry size
    regardless of any focused-run filter — and a payload covering fewer
    queries than its own registry is refused; (2) ONLY payloads lacking
    n_registry are cross-checked against the largest side: a legacy side
    covering <80% of the other side's query count is a partial/smoke
    artifact, not a baseline (genuine round-over-round registry growth
    is a few percent, never a 5x count gap). A payload that fully covers
    its own registry is already validated by net 1 — applying the 80%
    heuristic to it would refuse two genuinely-full runs whose
    registries legitimately diverged (large query-set growth or a
    trimmed registry)."""
    bad = []
    for label, d in payloads:
        reg = d.get("n_registry")
        if reg and len(d["queries"]) < reg:
            bad.append(f"{label} ({d.get('_path')}) covers "
                       f"{len(d['queries'])}/{reg} registered queries — "
                       f"a focused/smoke artifact must never be gated "
                       f"or become a baseline")
    counts = [(label, len(d["queries"]), d.get("n_registry"))
              for label, d in payloads]
    hi_label, hi, _ = max(counts, key=lambda x: x[1])
    for label, n, reg in counts:
        if reg and n >= reg:
            continue  # full vs its own registry — net 1 owns this side
        if n < 0.8 * hi:
            bad.append(f"{label} covers {n} queries vs {hi_label}'s {hi} "
                       f"— one side is a partial/smoke artifact")
    return bad


def medians(d):
    """plain medians compare like-for-like; 'queries' may hold best-3
    values for noisy entries (only overlay plain when present)."""
    return {**d["queries"], **d.get("plain", {})}


def check_remeasured(new, nq):
    """Validate the NEW payload's remeasured substitutions; returns a
    list of violation strings (empty = OK). Every entry is printed so
    a reader of the gate log sees exactly what was substituted."""
    bad = []
    rem = new.get("remeasured", {})
    if not isinstance(rem, dict):
        return [f"remeasured must be an object, got {type(rem).__name__}"]
    for name in sorted(rem):
        e = rem[name]
        if not isinstance(e, dict):
            bad.append(f"remeasured[{name}]: must be an object")
            continue
        med = e.get("median")
        full = e.get("full_run_median")
        reps = e.get("reps")
        print(f"REMEASURED  {name}: full-run {full}s substituted with "
              f"focused median {med}s (reps={reps})")
        if full is None:
            bad.append(f"remeasured[{name}]: missing full_run_median — "
                       f"nothing to audit the substitution against")
        if not isinstance(reps, int) or reps < 3:
            bad.append(f"remeasured[{name}]: reps={reps!r} < 3 — a "
                       f"substitution must itself be a >=3-rep median")
        pub = nq.get(name)
        if med is None or pub is None or abs(pub - med) > 1e-9:
            bad.append(f"remeasured[{name}]: substituted median {med} "
                       f"does not match published number {pub}")
    return bad


def effective_hostcal(d, key):
    """The payload's host-speed estimate for `key`. Normally the
    published mean of the before/after pair — but when the pair itself
    drifts >20% (self-declared mid-run contention), the MEAN is
    poisoned: contention only ever INFLATES a sample, so the mean
    overstates how slow the host intrinsically was and mis-normalizes
    every query that ran in the clean phase (r17: a base leg with
    157.9 -> 205.8 ms drift pushed two steady output-growth queries
    over the scale gate's superlinear bar purely via the inflated
    mean). For a drifting pair the MIN of the two samples is the
    intrinsic-speed estimate. Returns (value, adjusted_bool)."""
    v = d.get(key)
    s, e = d.get(f"{key}_start"), d.get(f"{key}_end")
    if v and s and e and min(s, e) > 0 and max(s, e) / min(s, e) > 1.2:
        return min(s, e), True
    return v, False


def hostcal_ratio(new, base):
    """(ratio, description, leg). Prefers the 32-task parallel leg when
    BOTH sides carry it (the bench runs local[32]; contention lives in
    the parallel regime — the scalar leg demonstrably under-corrects),
    falls back to the scalar leg, and returns ratio=1.0 with an
    explanatory note when neither leg is on both sides. Each side's
    value comes from effective_hostcal (min-of-pair under >20% drift)."""
    for key, leg in (("hostcal_par_ms", "hostcal_par (32-task leg)"),
                     ("hostcal_ms", "hostcal (scalar leg)")):
        (hn, an), (hb, ab) = (effective_hostcal(new, key),
                              effective_hostcal(base, key))
        if hn and hb:
            raw = hn / hb
            lo, hi = HOSTCAL_CLAMP
            ratio = min(max(raw, lo), hi)
            adj = "".join(
                f" [{side} pair drifted >20% — using min sample]"
                for side, a in (("new", an), ("base", ab)) if a)
            note = (f"{leg}: new {hn:.0f} ms / base {hb:.0f} ms = "
                    f"{raw:.3f}"
                    + (f" (clamped to {ratio:.3f})" if ratio != raw
                       else "")
                    + adj + " — thresholds normalized")
            return ratio, note, key
    return 1.0, "hostcal unavailable on one side — raw thresholds", None


def contention_warnings(payloads):
    """A payload whose own before/after parallel-calibration samples
    disagree by >20% self-declares mid-run host contention (r13: the
    driver run drifted 182.8 -> 134.6 ms and nothing flagged it).
    Warn-only — returns strings, never touches the exit code."""
    warns = []
    for label, d in payloads:
        s, e = d.get("hostcal_par_ms_start"), d.get("hostcal_par_ms_end")
        if s and e:
            drift = max(s, e) / min(s, e)
            if drift > 1.2:
                warns.append(
                    f"{label} ({d.get('_path')}): hostcal_par "
                    f"{s:.1f} -> {e:.1f} ms ({(drift - 1) * 100:.0f}% "
                    f"drift within the run) — host contention changed "
                    f"mid-run; treat this side's TOTAL as context and "
                    f"trust only per-query medians")
    return warns


def main() -> int:
    accepted = set()
    reasons = {}      # name -> reason string (for printing)
    pins = {}         # name -> recorded baseline_median (None = unpinned)
    try:
        with open(ACCEPT_FILE) as f:
            raw_accept = json.load(f)
        for name, entry in raw_accept.items():
            if not (isinstance(entry, dict) and "reason" in entry
                    and "baseline_median" in entry):
                print(f"accept-file entry {name!r} must be "
                      f'{{"reason": ..., "baseline_median": <BASE '
                      f"median>}} — a bare string can't be checked for "
                      f"staleness")
                return 2
            reasons[name] = entry["reason"]
            pins[name] = entry["baseline_median"]
        accepted |= set(reasons)
        if reasons:
            print(f"accept-file {ACCEPT_FILE}: "
                  f"{', '.join(sorted(reasons))}")
    except FileNotFoundError:
        pass
    argv = []
    prev2_path = None
    for a in sys.argv[1:]:
        if a.startswith("--accept="):
            for q in a[len("--accept="):].split(","):
                if q:
                    accepted.add(q)
                    reasons.setdefault(q, "accepted via --accept flag")
                    pins.setdefault(q, None)
        elif a.startswith("--prev2="):
            prev2_path = a[len("--prev2="):]
        else:
            argv.append(a)
    sys.argv = [sys.argv[0]] + argv
    if len(sys.argv) < 3:
        print(__doc__)
        return 2

    new = load_bench(sys.argv[1])
    base = load_bench(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    prev2 = load_bench(prev2_path) if prev2_path else None
    cov_bad = coverage_violations(
        [("NEW", new), ("BASE", base)]
        + ([("PREV2", prev2)] if prev2 else []))
    if cov_bad:
        for b in cov_bad:
            print(f"UNDER-COVERED  {b}")
        print(f"== GATE MALFORMED: {len(cov_bad)} coverage "
              f"violation(s) ==")
        return 2
    nq, bq = medians(new), medians(base)
    nsp = new.get("spread", {})
    # sub-second queries are dominated by fixed per-query costs (session,
    # planning, JIT); a 3x there is noise, not a plan regression
    floor_sec = 1.0

    rem_bad = check_remeasured(new, nq)
    if rem_bad:
        for b in rem_bad:
            print(f"MALFORMED  {b}")
        print(f"== GATE MALFORMED: {len(rem_bad)} remeasured "
              f"violation(s) ==")
        return 2

    ratio, note, leg = hostcal_ratio(new, base)
    print(note)
    # whichever calibration leg did NOT drive the thresholds is printed
    # informationally so a scalar-vs-parallel divergence (the r12/r13
    # driver-vs-builder skew signature) stays visible in the gate log
    other = "hostcal_ms" if leg == "hostcal_par_ms" else "hostcal_par_ms"
    ho_n, ho_b = new.get(other), base.get(other)
    if leg and ho_n and ho_b:
        print(f"{other.replace('_ms', '')}: new {ho_n:.0f} ms / base "
              f"{ho_b:.0f} ms = {ho_n / ho_b:.3f} (informational — "
              f"thresholds use the "
              f"{'parallel' if leg == 'hostcal_par_ms' else 'scalar'} "
              f"leg)")
    for w in contention_warnings(
            [("NEW", new), ("BASE", base)]
            + ([("PREV2", prev2)] if prev2 else [])):
        print(f"CONTENDED  {w}")

    regressions, noisy, noisy_adj = [], [], []
    rem_names = set(new.get("remeasured", {}))
    # a query that regressed from WORKING to FAILING is the worst
    # regression of all — it used to fall through the growth check
    # (reported as -1, absent from 'plain') and the gate never saw it
    new_failed = set(new.get("failed", []))
    new_failed |= {k for k, v in nq.items() if v is not None and v < 0}
    for name in sorted(new_failed):
        b = bq.get(name)
        if b is not None and b > 0:
            regressions.append((name, b, -1.0, 0.0))
    changed, triggered_raw = [], set()
    for name in sorted(set(nq) & set(bq)):
        if name in new_failed:
            continue
        n, b = nq[name], bq[name]
        raw_x = n / b if b > 0 else float("inf")
        norm_x = raw_x / ratio
        # staleness below treats an entry as live if it triggers under
        # EITHER the raw or the normalized threshold: raw-only flips
        # live->STALE on a slow host (r12 fix), but normalized-only
        # flips it on a FAST host (ratio<1 widens the raw bar past the
        # normalized one, so an entry actively absorbing a
        # normalized-triggered growth looked dead and the advised prune
        # would convert the next run into a REGRESSION). Stale means it
        # triggers under NEITHER — host speed in either direction can't
        # kill a live entry.
        if (n >= max(b * factor, floor_sec)
                or n >= max(b * factor * ratio, floor_sec)):
            triggered_raw.add(name)
        sp = nsp.get(name, 0.0)
        # PER-PASS EPISODE DISCOUNT (VERDICT r17 #2): before flagging,
        # re-evaluate the mover on its clean-pass reps only. A flag
        # that vanishes when contended-pass samples are excluded is the
        # episode class the focused-leg ritual existed for — print the
        # discount (auditable) instead of demanding a fresh leg.
        cm = clean_pass_median(new, name) if b > 0 else None
        if n < max(b * factor * ratio, floor_sec):
            # sub-gate mover whose own artifact says the median is one
            # rep wide: >2x normalized AND spread > half the median.
            # A valid remeasured entry IS the focused adjudication.
            if (name not in accepted and name not in rem_names
                    and b > 0 and n >= floor_sec
                    and norm_x >= NOISY_ADJ_FACTOR
                    and sp > NOISY_ADJ_SPREAD_FRAC * n):
                if cm is not None and (cm / b) / ratio < NOISY_ADJ_FACTOR:
                    print(f"EPISODE-DISCOUNTED  {name}: {b:.2f}s -> "
                          f"{n:.2f}s flagged noisy-adjudicate, but the "
                          f"clean-pass median is {cm:.2f}s "
                          f"({(cm / b) / ratio:.1f}x host-normalized) — "
                          f"contended-pass reps discounted via "
                          f"hostcal_par_ms_passes")
                else:
                    noisy_adj.append((name, b, n, norm_x, sp))
            continue
        if name in accepted:
            changed.append((name, b, n))
        elif cm is not None and cm < max(b * factor * ratio, floor_sec):
            print(f"EPISODE-DISCOUNTED  {name}: {b:.2f}s -> {n:.2f}s "
                  f"over the gate, but the clean-pass median is "
                  f"{cm:.2f}s (under the bar) — contended-pass reps "
                  f"discounted via hostcal_par_ms_passes")
        elif sp > n:
            noisy.append((name, b, n, sp))
        else:
            regressions.append((name, b, n, raw_x, norm_x,
                                nsp.get(name, 0.0)))

    stale = []
    for name in sorted(set(pins)):
        pin = pins[name]
        if pin is None:  # ad-hoc --accept: current run only, unpinned
            continue
        b = bq.get(name)
        if name not in nq:
            # distinct from "absorbed": the query never ran in NEW, so
            # nothing can be said about absorption — the entry is dead
            # weight either way (r12 ADVICE: the absorbed message here
            # was misleading)
            stale.append((name, "query absent from NEW — entry names a "
                          "query this run never measured"))
        elif b is None:
            stale.append((name, f"query absent from BASE — entry "
                          f"outlived its baseline"))
        elif abs(b - pin) > max(1e-9, abs(pin) * 1e-6):
            stale.append((name, f"recorded baseline_median {pin} != "
                          f"BASE median {b} — baseline moved on"))
        elif name not in triggered_raw:
            # live under NEITHER the raw nor the normalized trigger
            # (see the loop above) so host speed in either direction
            # can never flip a live entry to STALE
            stale.append((name, "no longer triggers the growth check "
                          "(neither raw nor host-normalized) — baseline "
                          "absorbed it"))
    for name, why in stale:
        print(f"STALE-ACCEPT  {name}: {why}; PRUNE it from "
              f"benchgate_accept.json (a stale entry must never "
              f"pre-approve a future regression)")

    for name, b, n in changed:
        why = reasons.get(name, "accepted via --accept flag")
        print(f"CHANGED  {name}: {b:.2f}s -> {n:.2f}s ({n / b:.1f}x) — "
              f"deliberate definition change ({why}); next round's "
              f"baseline absorbs it")

    for name, b, n, sp in noisy:
        print(f"NOISY  {name}: {b:.2f}s -> {n:.2f}s (spread {sp:.2f}s "
              f"> median; RE-RUN REQUIRED before this gate can pass)")
    for name, b, n, norm_x, sp in noisy_adj:
        print(f"NOISY-ADJUDICATE  {name}: {b:.2f}s -> {n:.2f}s "
              f"({norm_x:.1f}x host-normalized, spread {sp:.2f}s = "
              f"{sp / n:.2f}x median) — self-declared one-rep-wide "
              f"median; adjudicate with focused steady-state reps (the "
              f"remeasured protocol) before reading this as pass")
    for r in regressions:
        if len(r) == 4:  # working -> failing
            name, b, n, _ = r
            print(f"REGRESSION  {name}: {b:.2f}s -> FAILED")
        else:
            name, b, n, raw_x, norm_x, sp = r
            print(f"REGRESSION  {name}: {b:.2f}s -> {n:.2f}s "
                  f"({raw_x:.1f}x raw, {norm_x:.1f}x host-normalized, "
                  f"spread {sp:.2f}s)")

    # warn-only cumulative drift vs the round-before-last baseline
    total_creep = None
    if prev2 is not None:
        p2q = medians(prev2)
        r2, note2, leg2 = hostcal_ratio(new, prev2)
        print(f"cumulative check vs {prev2_path}: {note2}")
        n_cum = 0
        for name in sorted(set(nq) & set(p2q)):
            if name in new_failed or name in accepted:
                continue
            n, p = nq[name], p2q[name]
            if p > 0 and n >= max(p * CUMULATIVE_FACTOR * r2, floor_sec):
                n_cum += 1
                print(f"CUMULATIVE  {name}: {p:.2f}s (N-2) -> {n:.2f}s "
                      f"({n / p:.1f}x over two rounds, each step under "
                      f"the per-round gate) — adjudicate")
        if n_cum == 0:
            print("cumulative check: no compounding drift "
                  f">{CUMULATIVE_FACTOR}x vs N-2")
        # TOTAL-LEVEL CREEP TRIPWIRE (VERDICT r16 #2): committed round
        # totals walked 338->383 s over two rounds against a
        # flat-to-faster hostcal, and nothing gated the SUM — the
        # per-query 3x never fires on a fleet-wide few-percent drift.
        # Trips (exit 3, rerun-required) when Σ medians over the shared
        # query set grew >TOTAL_CREEP_FACTOR vs N-2 while the
        # normalized hostcal sits within ±TOTAL_CREEP_HOSTCAL_BAND (a
        # genuinely slower host is not creep — per-query normalization
        # already absorbs it; outside the band the sum comparison is
        # meaningless and stays silent). Accepted definition changes
        # are excluded from both sums, so a deliberate heavier query
        # can't trip it. Adjudication: one full preflight-clean
        # idle-host leg — reproduces ⇒ real, bisect; doesn't ⇒ commit
        # the clean leg as the round artifact.
        shared_tot = [q for q in set(nq) & set(p2q)
                      if q not in new_failed and q not in accepted
                      and nq.get(q) and nq[q] > 0
                      and p2q.get(q) and p2q[q] > 0]
        tot_n = sum(nq[q] for q in shared_tot)
        tot_p = sum(p2q[q] for q in shared_tot)
        if leg2 is None:
            # no measured calibration on one side — a flat-ratio
            # FALLBACK must not masquerade as "hostcal within band"
            print("total check: hostcal unavailable on one side — "
                  "creep tripwire silent")
        elif tot_p == 0:
            # ADVICE r17: an empty shared set used to fall into the
            # hostcal-band else branch and print a misleading cause
            print("total check: no shared non-accepted queries — "
                  "creep tripwire silent")
        elif abs(r2 - 1.0) <= TOTAL_CREEP_HOSTCAL_BAND:
            if tot_n > tot_p * TOTAL_CREEP_FACTOR * r2:
                total_creep = (tot_n, tot_p, r2, len(shared_tot))
                print(f"TOTAL-CREEP  Σ medians {tot_p:.1f}s (N-2) -> "
                      f"{tot_n:.1f}s over {len(shared_tot)} shared "
                      f"queries ({tot_n / tot_p:.3f}x raw, "
                      f"{tot_n / (tot_p * r2):.3f}x host-normalized, "
                      f"hostcal ratio {r2:.3f}) — fleet-wide drift no "
                      f"per-query gate sees; adjudicate with one full "
                      f"preflight-clean idle-host leg")
            else:
                print(f"total check: Σ {tot_n:.1f}s vs N-2 Σ "
                      f"{tot_p:.1f}s ({tot_n / (tot_p * r2):.3f}x "
                      f"host-normalized) — under the "
                      f"{TOTAL_CREEP_FACTOR}x creep bar")
        else:
            print(f"total check: hostcal ratio {r2:.3f} outside "
                  f"±{TOTAL_CREEP_HOSTCAL_BAND:.0%} — Σ comparison "
                  f"not meaningful, creep tripwire silent")

    only_new = sorted(set(nq) - set(bq))
    if only_new:
        print(f"new queries (no baseline): {len(only_new)}")
    gone = sorted(set(bq) - set(nq))
    if gone:
        print(f"queries missing vs baseline: {gone}")

    if regressions or stale:
        print(f"== GATE FAIL: {len(regressions)} regression(s), "
              f"{len(stale)} stale accept entr(ies) ==")
        return 1
    if noisy or noisy_adj or total_creep:
        print(f"== GATE RERUN-REQUIRED: {len(noisy)} noisy grower(s), "
              f"{len(noisy_adj)} noisy-adjudicate mover(s)"
              + (", TOTAL-CREEP" if total_creep else "")
              + " — not a pass ==")
        return 3
    print(f"== GATE PASS: {len(set(nq) & set(bq))} compared ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
