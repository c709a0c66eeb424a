#!/usr/bin/env python3
"""Membership picker for the sf1 scale leg (VERDICT r15 #8): the
top-51-by-median set was stable round over round, so mid-cost queries
never got a gated scale reading. The leg is now

  top-51 by base-SF median                 (the fixed, expensive core)
  + ANN family                             (q24/q25/q63/q68/q91 — the
    one family with no sf1 row while embeddings duplicated verbatim;
    StageScale's per-copy orthogonal sign-flip makes their 10x leg
    meaningful from r16 on, VERDICT r15 #4)
  + ~10 seeded-rotation picks from rank 52+ (seed = round number, so
    each round gates a different mid-cost slice and any query's turn
    comes around deterministically)

Usage: python3 scripts/sf1_leg.py <base_bench.json> <round> [n_rotate]
Prints the query names one per line (feed as args to graft.Bench).
"""
import json
import random
import sys

FIXED_TOP = 51
ANN_FAMILY = ["q24_cosine_topk", "q25_ivf_ann", "q63_ivf_nprobe",
              "q68_quantized_ann", "q91_hyperplane_lsh"]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base = json.load(open(sys.argv[1]))
    rnd = int(sys.argv[2])
    n_rotate = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    medians = {**base["queries"], **base.get("plain", {})}
    ranked = sorted(medians, key=lambda q: -medians[q])
    top = set(ranked[:FIXED_TOP])
    leg = top | set(ANN_FAMILY)
    ann_extra = len(leg) - len(top)  # ANN members NOT already in top-N
    pool = [q for q in ranked[FIXED_TOP:] if q not in leg]
    # seeded by round: deterministic, different slice each round
    rotated = random.Random(rnd).sample(pool, min(n_rotate, len(pool)))
    leg |= set(rotated)
    for q in sorted(leg):
        print(q)
    # real composition, not the nominal one: ANN members inside the
    # top-N are unioned away (ADVICE r16 — the breakdown overstated)
    print(f"# {len(leg)} queries: top-{FIXED_TOP} fixed + "
          f"{ann_extra} ANN (of {len(ANN_FAMILY)}, rest in top) + "
          f"{len(rotated)} rotating (round {rnd})",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
