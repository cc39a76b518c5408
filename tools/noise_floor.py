#!/usr/bin/env python3
"""Derive compare_bench's flagging floor from measured data (VERDICT r15
item 6): SURVEY §8 admits ±20% scheduler-latency swings on sub-second
queries that the calibration probes don't price, and compare_bench has
been papering over that with a hardcoded 0.5 s floor. This tool reads a
many-pass Bench artifact (SPARK_GRAFT_EMIT_SAMPLES=1 SPARK_GRAFT_PASSES=K
SPARK_GRAFT_NO_RETRY=1) and computes the floor the data supports.

Method:
  - per query: n, min, median, p90, spread = median/min over the K
    samples (min is the estimator the sweeps report, so spread measures
    how much a typical sample sits above the reportable value);
  - queries are bucketed by min; per bucket, the MEDIAN spread;
  - a cross-round comparison divides two independent mins, so each side
    may contribute sqrt(threshold) of apparent ratio before the flag is
    meaningful: side_bound = sqrt(threshold);
  - floor_sec = the lower edge of the smallest bucket such that EVERY
    bucket at or above it has median spread <= side_bound. Queries whose
    min is under the floor flag only on evidence the noise can't fake.

Usage:
  python3 tools/noise_floor.py SAMPLES.json [--threshold 1.25] \
      [--json OUT.json]
"""
import argparse
import json
import math
import re
import sys

BUCKETS = [0.0, 0.25, 0.5, 1.0, 2.0, 5.0]


def load(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        m = re.search(r'\{"metric".*\}', raw)
        if not m:
            sys.exit(f"{path}: no bench JSON line found")
        d = json.loads(m.group(0))
    if "samples" not in d:
        sys.exit(f"{path}: no 'samples' map — rerun Bench with "
                 "SPARK_GRAFT_EMIT_SAMPLES=1")
    return d


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(math.ceil(p * len(xs))) - 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--json", dest="json_out")
    args = ap.parse_args()

    art = load(args.artifact)
    side_bound = math.sqrt(args.threshold)
    qstats = {}
    for q, xs in art["samples"].items():
        xs = [float(x) for x in xs if x > 0]
        if len(xs) < 3:
            continue
        mn = min(xs)
        qstats[q] = {
            "n": len(xs), "min": round(mn, 4),
            "median": round(pct(xs, 0.5), 4),
            "p90": round(pct(xs, 0.9), 4),
            "max": round(max(xs), 4),
            "spread": round(pct(xs, 0.5) / mn, 4),
        }
    if not qstats:
        sys.exit("no queries with >= 3 samples")

    buckets = []
    for i, lo in enumerate(BUCKETS):
        hi = BUCKETS[i + 1] if i + 1 < len(BUCKETS) else float("inf")
        qs = [s for s in qstats.values() if lo <= s["min"] < hi]
        if qs:
            buckets.append({
                "lo": lo, "hi": hi, "n": len(qs),
                "median_spread": round(pct([s["spread"] for s in qs], 0.5), 4),
                "p90_spread": round(pct([s["spread"] for s in qs], 0.9), 4),
            })

    floor = None
    for i, b in enumerate(buckets):
        if all(bb["median_spread"] <= side_bound for bb in buckets[i:]):
            floor = b["lo"]
            break
    if floor is None:  # even the slowest bucket is noisier than the bound
        floor = buckets[-1]["lo"]
        print("WARNING: no bucket run is quiet enough; floor set to the "
              "slowest bucket's edge — treat every flag as suspect")

    print(f"threshold {args.threshold}  side_bound {side_bound:.3f}")
    print("| bucket (s) | queries | median spread | p90 spread |")
    print("|---|---|---|---|")
    for b in buckets:
        hi = "inf" if b["hi"] == float("inf") else b["hi"]
        print(f"| [{b['lo']}, {hi}) | {b['n']} | {b['median_spread']} "
              f"| {b['p90_spread']} |")
    print(f"\nfloor_sec = {floor}  (queries with min below this flag only "
          "beyond what measured noise can fake)")
    noisiest = sorted(qstats.items(), key=lambda kv: -kv[1]["spread"])[:8]
    print("noisiest queries:",
          ", ".join(f"{q} x{s['spread']}" for q, s in noisiest))

    if args.json_out:
        json.dump({"sf": art.get("sf"), "threshold": args.threshold,
                   "side_bound": round(side_bound, 4),
                   "floor_sec": floor,
                   "buckets": [dict(b, hi=(None if b["hi"] == float("inf")
                                           else b["hi"])) for b in buckets],
                   "queries": qstats},
                  open(args.json_out, "w"), indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
