#!/usr/bin/env python3
"""Cross-round bench comparison, normalized by each artifact's window
calibration block (VERDICT r14 item 4: the ratio table should come from a
tool, not prose).

Usage:
  python3 tools/compare_bench.py OLD.json NEW.json [--threshold 1.25] [--json OUT.json]

Each artifact is a Bench stdout line (or BENCH_r{NN}.json whose "tail"
holds one): {"queries": {name: sec}, "calibration": {"pre": {...},
"post": {...}}, ...}. Since r14 every artifact carries the calibration
block — three fixed probes (cpu_st single-thread mix loop, cpu_mt
all-core hash-agg, scan lineitem scan+sum) sampled before AND after the
sweep, so a window's speed is measured, not assumed.

Method:
  - window factor per artifact = geometric mean of the three probes,
    taking min(pre, post) per probe (min-of-2, the same discipline the
    query samples use). `scan` is excluded when the two artifacts ran at
    different SFs (the probe scans the sweep's own lineitem, so its cost
    is not comparable across SFs).
  - raw ratio      = new_sec / old_sec  per query
  - norm ratio     = raw ratio / (new_window / old_window)
  - outliers: |log(norm ratio)| > log(threshold) (default 1.25×), with
    a floor — queries under 0.5 s in both artifacts never flag (noise).
Prints a markdown table sorted by norm ratio (worst first) plus a
summary line; --json dumps the full join for the round log.
"""
import argparse
import json
import math
import re
import sys


def load_artifact(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        # maybe a log file holding the JSON line somewhere
        m = re.search(r'\{"metric".*\}', raw)
        if not m:
            sys.exit(f"{path}: no bench JSON line found")
        d = json.loads(m.group(0))
    # driver-style BENCH_r{NN}.json wraps the line in a "tail" string
    if "queries" not in d and "tail" in d:
        m = re.search(r'\{"metric".*\}', d["tail"])
        if not m:
            sys.exit(f"{path}: tail holds no bench JSON line")
        d = json.loads(m.group(0))
    # lifecycle artifacts carry the same shape under "phases"
    if "queries" not in d and "phases" in d:
        d = dict(d, queries=d["phases"])
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' map")
    return d


def window_factor(art, use_scan):
    cal = art.get("calibration")
    if not cal:
        return None
    probes = ["cpu_st", "cpu_mt"] + (["scan"] if use_scan else [])
    vals = []
    for p in probes:
        pre = cal.get("pre", {}).get(p)
        post = cal.get("post", {}).get(p)
        xs = [x for x in (pre, post) if isinstance(x, (int, float)) and x > 0]
        if xs:
            vals.append(min(xs))
    if not vals:
        return None
    return math.exp(sum(math.log(v) for v in vals) / len(vals))


def sf_of(art):
    m = re.search(r"sf([0-9]*\.?[0-9]+)", str(art.get("sf", "")))
    return float(m.group(1)) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="seconds; queries under this in BOTH artifacts never flag")
    ap.add_argument("--json", dest="json_out")
    args = ap.parse_args()

    old, new = load_artifact(args.old), load_artifact(args.new)
    same_sf = sf_of(old) is not None and sf_of(old) == sf_of(new)
    w_old = window_factor(old, use_scan=same_sf)
    w_new = window_factor(new, use_scan=same_sf)
    if w_old and w_new:
        w_ratio = w_new / w_old
        note = ("calibration window ratio new/old = %.3f (probes: cpu_st, "
                "cpu_mt%s)" % (w_ratio, ", scan" if same_sf else ""))
    else:
        w_ratio = 1.0
        note = "WARNING: calibration block missing in at least one artifact; norm == raw"

    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    rows = []
    for q in common:
        a, b = float(qo[q]), float(qn[q])
        if a <= 0 or b <= 0:
            continue
        raw = b / a
        norm = raw / w_ratio
        flag = (abs(math.log(norm)) > math.log(args.threshold)
                and max(a, b) >= args.floor)
        rows.append({"query": q, "old_sec": a, "new_sec": b,
                     "raw_ratio": round(raw, 3), "norm_ratio": round(norm, 3),
                     "outlier": flag})
    if not rows:
        sys.exit("no common queries")

    norms = sorted(r["norm_ratio"] for r in rows)
    median = norms[len(norms) // 2]
    sum_old = sum(r["old_sec"] for r in rows)
    sum_new = sum(r["new_sec"] for r in rows)
    outliers = [r for r in rows if r["outlier"]]

    print(note)
    print(f"common queries: {len(rows)}  sum old {sum_old:.1f}s -> new "
          f"{sum_new:.1f}s (raw {sum_new / sum_old:.3f}, norm "
          f"{sum_new / sum_old / w_ratio:.3f})  median norm ratio {median:.3f}")
    print(f"only-in-old: {sorted(set(qo) - set(qn))or '-'}")
    print(f"only-in-new: {sorted(set(qn) - set(qo)) or '-'}")
    print()
    print("| query | old s | new s | raw | norm | flag |")
    print("|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -r["norm_ratio"]):
        print("| %s | %.2f | %.2f | %.3f | %.3f | %s |" % (
            r["query"], r["old_sec"], r["new_sec"], r["raw_ratio"],
            r["norm_ratio"], "OUTLIER" if r["outlier"] else ""))
    print()
    if outliers:
        print("outliers (norm ratio beyond %.2fx, >= %.1fs): %s" % (
            args.threshold, args.floor,
            ", ".join(f"{r['query']} {r['norm_ratio']}" for r in
                      sorted(outliers, key=lambda r: -r["norm_ratio"]))))
    else:
        print(f"no outliers beyond {args.threshold}x")

    if args.json_out:
        json.dump({"window_ratio": w_ratio, "median_norm_ratio": median,
                   "sum_old_sec": round(sum_old, 2),
                   "sum_new_sec": round(sum_new, 2),
                   "threshold": args.threshold,
                   "outliers": [r["query"] for r in outliers],
                   "rows": rows},
                  open(args.json_out, "w"), indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
