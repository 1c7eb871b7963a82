#!/usr/bin/env python3
"""Merge the same-day deep-battery runs into BENCH_SCALE_DEEP.json.

Battery A: all 12 rows, factors 1/10/40/100 (one battery per row — every
cell of a row measured in one JVM). Battery B: the heaviest rows at
factors 1/200 (its own same-battery x1, so the x200 ratio never mixes
batteries). Each row's published ratio is deepest-cell / same-battery x1.
"""
import json
import sys

a_path, b_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
a = json.load(open(a_path))
b = json.load(open(b_path))

queries = {}
for q, cells in a["queries"].items():
    row = {k: v for k, v in cells.items() if k.startswith("x")}
    # both battery-B cells must be real: a failed cell is a -1 sentinel
    # (and x1 could in principle be 0), so guarding only x200 would
    # publish a negative ratio or divide by zero. A bad battery-B x1
    # falls back to the battery-A ratio below.
    if (q in b["queries"] and b["queries"][q].get("x200", -1) > 0
            and b["queries"][q].get("x1", -1) > 0):
        bx1, bx200 = b["queries"][q]["x1"], b["queries"][q]["x200"]
        row["x200"] = bx200
        row["x200_battery_x1"] = bx1
        row["ratio"] = round(bx200 / bx1, 2)
    else:
        row["ratio"] = round(cells["x100"] / cells["x1"], 2) if cells.get("x100", -1) > 0 else -1
    queries[q] = row

out = {
    "metric": "scale_curve",
    "base": a["base"],
    "factors": [1, 10, 40, 100, 200],
    "note": (
        "r15 SAME-DAY refresh (r14 verdict task #3): every cell of every row "
        "re-measured today — battery A runs all twelve rows at x1/x10/x40/x100 "
        "in one JVM (one battery per row, min of 5 reps per cell), battery B "
        "extends the heaviest pair joins to x200 with its own same-battery x1 "
        "(reported as x200_battery_x1). ratio = deepest cell / same-battery x1; "
        "linear scaling => ratio <= deepest factor. Corpora replicate sf0.1 with "
        "disjoint gram/id spaces (see ScaleBench). Adjacent steps are now "
        "comparable: no cell predates today."
    ),
    "reps": 5,
    "battery_a": {k: a[k] for k in ("loadavg_before", "loadavg_after", "steal_pct") if k in a},
    "battery_b": {k: b[k] for k in ("loadavg_before", "loadavg_after", "steal_pct") if k in b},
    "queries": queries,
}
with open(out_path, "w") as f:
    json.dump(out, f)
    f.write("\n")
print(json.dumps(out, indent=1)[:2000])
