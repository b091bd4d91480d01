#!/usr/bin/env python3
"""Dev-only scale-curve gate over SCALE.json (written by
`sbt "runMain graft.Scale"`): flags any query whose measured sf0.01 →
sf0.1 growth is meaningfully superlinear.

    python3 tools/scalecheck.py SCALE.json [--threshold 1.3]

A slope is log10(metric@sf0.1 / metric@sf0.01) against a 10x data
jump, so 1.0 = linear. shuffle_slope is plan-determined (noise-free)
and gated with a 1 MB absolute floor at the larger sf — sub-MB
shuffles crossing a broadcast threshold read as huge slopes without
being a scale risk. time_slope is noisier on a shared box (fixed
per-query overheads at small sf push it DOWN; ambient load pushes it
up) and is reported but gated at the same threshold.

Exit 1 if anything is flagged outside the documented allowlist.
"""
import json
import sys

# Queries whose superlinear growth is the MEASURED QUANTITY, not a
# plan defect — each with the reason it is intended (the PlanAudit
# allowlist discipline). Still printed, never silently dropped.
ALLOW = {
    "dedup_prefix_stats":
        "diagnostic query: n_cand_full IS the full inverted index's "
        "superlinear candidate blowup (measured ss 1.69) that prefix "
        "filtering exists to avoid — the production operator "
        "dedup_prefix_jaccard holds shuffle_slope 0.98 in this same "
        "artifact",
    # The two entries below flag only on the sf0.1 -> sf1.0 TOP decade
    # of the builder-generated fixture, where the driver-convention
    # 31-word vocabulary SATURATES its 3-gram shingle space (31^3 =
    # 29,791 possible shingles for 2.5M shingle instances at sf1.0:
    # every shingle is hot, so any two docs share one by the birthday
    # bound — 107M full-index candidates for 398 true pairs). Real
    # corpora grow vocabulary by Heaps' law and keep shingle df Zipf-
    # tailed, which is the regime the operators' slopes <= 1.0 at the
    # driver sfs measure. Root fix queued: give GenData a Heaps tail
    # beyond the 31 probe words and re-measure. The PPJoin positional
    # filter (round 11) already cuts the saturated-regime candidates
    # 4x and the sf1.0 wall 3x, exactness spec-pinned.
    "dedup_prefix_jaccard":
        "top-decade flag is fixture shingle-space saturation (31-word "
        "vocab => 30k possible shingles), not plan growth; sf0.001-0.1 "
        "slopes <= 1.0; positional filter landed, Heaps-vocab fixture "
        "fix queued",
    "text_phrase_search":
        "same saturation artifact: every 3-gram posting list is hot "
        "at sf1.0 under the 31-word fixture vocabulary; sf0.001-0.1 "
        "slopes <= 1.0",
}


def main(path, threshold=1.3):
    art = json.load(open(path))
    qs = art.get("queries", {})
    if not qs:
        print("no queries in artifact")
        return 1
    flagged = []
    n3 = 0
    n4 = 0
    for name, q in sorted(qs.items()):
        ssl = q.get("shuffle_slope")
        tsl = q.get("time_slope")
        big_mb = q.get("shuffle_mb", [0, 0])[-1]
        reasons = []
        if ssl is not None and ssl > threshold and big_mb > 1.0:
            reasons.append(f"shuffle_slope {ssl:.2f}")
        if tsl is not None and tsl > threshold:
            reasons.append(f"time_slope {tsl:.2f}")
        # multi-decade gate (3-/4-point heavy entries): per-decade
        # slopes over the full 100x (slope2) and 1000x (slope3) spans,
        # plus the top sf0.1->sf1.0 decade alone (slope_top — the
        # least overhead-polluted single decade) — fixed overhead can
        # hide a steep later decade in the single-decade number and
        # vice versa, so all are gated at the same threshold
        ssl2 = q.get("shuffle_slope2")
        tsl2 = q.get("time_slope2")
        if ssl2 is not None or tsl2 is not None:
            n3 += 1
        if q.get("time_slope3") is not None:
            n4 += 1
        if ssl2 is not None and ssl2 > threshold and big_mb > 1.0:
            reasons.append(f"shuffle_slope2 {ssl2:.2f}")
        if tsl2 is not None and tsl2 > threshold:
            reasons.append(f"time_slope2 {tsl2:.2f}")
        for k in ("shuffle_slope3", "shuffle_slope_top"):
            v = q.get(k)
            if v is not None and v > threshold and big_mb > 1.0:
                reasons.append(f"{k} {v:.2f}")
        for k in ("time_slope3", "time_slope_top"):
            v = q.get(k)
            if v is not None and v > threshold:
                reasons.append(f"{k} {v:.2f}")
        if reasons:
            flagged.append((name, q, reasons))
    allowed = [(n, q, r) for n, q, r in flagged if n in ALLOW]
    flagged = [(n, q, r) for n, q, r in flagged if n not in ALLOW]
    print(f"{len(qs)} queries measured ({n3} with two-decade curves, "
          f"{n4} with three-decade curves); "
          f"{len(flagged)} superlinear beyond {threshold} "
          f"({len(allowed)} allowlisted)")
    for name, _, reasons in allowed:
        print(f"  allowlisted {name} ({', '.join(reasons)}): {ALLOW[name]}")
    if art.get("failed"):
        print(f"failed to run: {art['failed']}")
    if not flagged:
        slopes = [q["shuffle_slope"] for q in qs.values()
                  if q.get("shuffle_slope") is not None]
        if slopes:
            print(f"max shuffle_slope {max(slopes):.2f}, "
                  f"median {sorted(slopes)[len(slopes) // 2]:.2f}")
        return 0
    print(f"\n{'query':30s} {'sec@.01':>8s} {'sec@.1':>8s} "
          f"{'mb@.01':>8s} {'mb@.1':>8s}  reasons")
    for name, q, reasons in flagged:
        s0, s1 = q["sec"][-2:]
        m0, m1 = q["shuffle_mb"][-2:]
        print(f"{name:30s} {s0:8.3f} {s1:8.3f} {m0:8.3f} {m1:8.3f}  "
              + ", ".join(reasons))
    return 1


if __name__ == "__main__":
    thr = 1.3
    argv = sys.argv[1:]
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:  # consume the space-separated value too
                thr = float(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    sys.exit(main(args[0], thr))
