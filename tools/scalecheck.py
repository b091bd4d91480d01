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
#
# KEYED BY (query, metric) (round-11 ADVICE): each entry names the
# exact slope fields it suppresses, so an allowlisted query's OTHER
# decades stay gated — a genuine plan regression in, say, the
# sf0.001->0.1 base decades of a query whose only documented artifact
# was a top-decade fixture effect must still fail. "metrics": None
# means all metrics (reserved for diagnostic queries whose measured
# quantity IS the blowup at every decade).
ALLOW = {
    "dedup_prefix_stats": {
        "metrics": None,
        "reason":
            "diagnostic query: n_cand_full IS the full inverted "
            "index's superlinear candidate blowup (measured ss 1.69) "
            "that prefix filtering exists to avoid — the production "
            "operator dedup_prefix_jaccard holds shuffle_slope 0.98 "
            "in this same artifact"},
    # (round 12: the r11 dedup_prefix_jaccard / text_phrase_search
    # saturation entries RETIRED — under the Heaps fixture the
    # re-measured curves are clean: prefix_jaccard sf1.0 = 0.40 s /
    # 0.38 MB shuffle, phrase_search same-regime shuffle_slope_h 1.01
    # after its stats pass moved from the 3-leg adjacency self-join
    # to lead() windows.)
    "dedup_winnow_pairs": {
        "metrics": {"shuffle_slope_h"},
        "reason":
            "hot-cap transition inside the full-span slope, not "
            "asymptotic growth: pair mass is sum df^2 over sub-64-cap "
            "fingerprints, which grows ~n^2 until the Zipf head "
            "crosses the cap and exactly linearly after "
            "(sum_{df<=64} df^2 -> 64*c*n). The artifact MEASURES the "
            "post-transition asymptote clean: shuffle_slope_h_top = "
            "1.07 over sf1.0->sf3.0 (274->892 MB for 3x data); only "
            "the transition-spanning full-span slope (1.39) is "
            "allowlisted; driver decades all <= 1.2"},
    "text_dup_coverage": {
        "metrics": {"shuffle_slope_h_top"},
        "reason":
            "constant drift, not a growth mode: every stage of the "
            "plan (positional-shingle distinct, df groupBy, the "
            "df join, the per-doc rollup) is O(tokens) ROWS by "
            "construction — no pair space exists. The half-decade "
            "bytes/token moved 69 -> 105 (8-gram STRINGS lengthen as "
            "the Heaps vocabulary's rank-digit tail widens, and the "
            "distinct/groupBy map-side combine loses effectiveness "
            "as shingles become near-unique), a bounded constant "
            "that converges once word length saturates; driver "
            "decades and the full-span h slope sit at 0.98-1.09"},
    "dedup_simhash_pairs": {
        "metrics": {"shuffle_slope_h", "shuffle_slope_h_top"},
        "reason":
            "hot-cap approach, winnow's shape with the knee beyond "
            "the sandbox: candidate mass is sum B*(B-1)/2 over "
            "sub-64-cap 16-bit chunk buckets, HARD-bounded at "
            "(cap-1)/2 * 4n < 126n pairs for all n (SimhashBoundSpec "
            "pins the bound in-plan). The measured slope is the "
            "approach to that ceiling from below — mass/n 0.4 at "
            "sf1.0 -> ~11 at sf3.0 vs the 126 ceiling; typical "
            "bucket occupancy n/2^16 crosses the cap only at ~4M "
            "docs/chunk, past which growth is exactly linear. "
            "Absolute top-point shuffle is 40 MB at 150k docs",
    },
    "text_vocab_growth": {
        "metrics": {"shuffle_slope_top"},
        "reason":
            "cross-REGIME decade: driver sf0.1 draws from 31 words "
            "(distinct-vocab mass 31) while builder sf1.0 is "
            "Heaps-distributed (~50k words) — and distinct vocabulary "
            "IS this operator's output. The same-regime Heaps decades "
            "measure shuffle_slope_h 0.72/h_top 0.75, sublinear as "
            "Heaps' law predicts"},
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
        # absolute floor for TIME slopes, mirroring the 1 MB shuffle
        # floor: a wall time under 0.5 s on local[32] is scheduler
        # latency (±50-100 ms/run), so a ratio between two such
        # points is noise, not growth — round 13 measured a
        # zero-shuffle 24 ms query "tripling" inside one sweep and
        # sitting dead flat in isolation. Shuffle slopes (plan-
        # determined) still gate those queries; if real work ever
        # grows, the top point crosses the floor and the gate
        # re-engages.
        def twall(key):
            arr = q.get(key) or [0]
            return arr[-1]
        reasons = []
        if ssl is not None and ssl > threshold and big_mb > 1.0:
            reasons.append(f"shuffle_slope {ssl:.2f}")
        if tsl is not None and tsl > threshold and twall("sec") >= 0.5:
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
        if tsl2 is not None and tsl2 > threshold and twall("sec") >= 0.5:
            reasons.append(f"time_slope2 {tsl2:.2f}")
        # *_h fields: the builder Heaps-fixture same-regime curve for
        # the text family (Scale.heapsSet) — gated like the driver
        # decades; its own 1 MB floor comes from its own top point
        big_mb_h = (q.get("shuffle_mb_h") or [0])[-1]
        for k in ("shuffle_slope3", "shuffle_slope_top"):
            v = q.get(k)
            if v is not None and v > threshold and big_mb > 1.0:
                reasons.append(f"{k} {v:.2f}")
        for k in ("shuffle_slope_h", "shuffle_slope_h_top"):
            v = q.get(k)
            if v is not None and v > threshold and big_mb_h > 1.0:
                reasons.append(f"{k} {v:.2f}")
        # *_d fields: the graph/CC/ANN sf1.0->sf3.0 pair (round-13,
        # Scale.deepSet) — already per-decade normalized by Scale, so
        # the same threshold applies; its 1 MB floor from its own pair
        big_mb_d = (q.get("shuffle_mb_d") or [0])[-1]
        v = q.get("shuffle_slope_d")
        if v is not None and v > threshold and big_mb_d > 1.0:
            reasons.append(f"shuffle_slope_d {v:.2f}")
        for k, wall_key in (("time_slope3", "sec"),
                            ("time_slope_top", "sec"),
                            ("time_slope_h", "sec_h"),
                            ("time_slope_h_top", "sec_h"),
                            ("time_slope_d", "sec_d")):
            v = q.get(k)
            if v is not None and v > threshold and twall(wall_key) >= 0.5:
                reasons.append(f"{k} {v:.2f}")
        if reasons:
            flagged.append((name, q, reasons))
    # per-metric allowlist split: a query stays flagged if ANY of its
    # flagged metrics is outside its ALLOW entry's metric set
    allowed, still = [], []
    for n, q, r in flagged:
        ent = ALLOW.get(n)
        if ent is None:
            still.append((n, q, r))
            continue
        ok = ent["metrics"]
        covered = [x for x in r if ok is None or x.split()[0] in ok]
        residual = [x for x in r if not (ok is None or x.split()[0] in ok)]
        if covered:
            allowed.append((n, q, covered))
        if residual:
            still.append((n, q, residual))
    flagged = still
    print(f"{len(qs)} queries measured ({n3} with two-decade curves, "
          f"{n4} with three-decade curves); "
          f"{len(flagged)} superlinear beyond {threshold} "
          f"({len(allowed)} allowlisted)")
    for name, _, reasons in allowed:
        print(f"  allowlisted {name} ({', '.join(reasons)}): "
              f"{ALLOW[name]['reason']}")
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
