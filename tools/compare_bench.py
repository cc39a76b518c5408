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
  - window factor per artifact = geometric mean of the cpu/scan probes
    VALID IN BOTH artifacts (r16: a probe missing on one side is dropped
    from both, with a warning — mixing probe sets mixes absolute scales),
    taking min(pre, post) per probe (min-of-2, the same discipline the
    query samples use). `scan` is excluded when the two artifacts ran at
    different SFs (the probe scans the sweep's own lineitem, so its cost
    is not comparable across SFs). The r16 `io` probe is excluded from
    the factor (it prices page-cache STATE, not host speed) and reported
    as a separate diagnostic; outliers whose direction matches a
    cold-started sweep are annotated `io-state?`.
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


def probe_min(art, p):
    """min(pre, post) of probe p in this artifact, or None if absent."""
    cal = art.get("calibration")
    if not cal:
        return None
    pre = cal.get("pre", {}).get(p)
    post = cal.get("post", {}).get(p)
    xs = [x for x in (pre, post) if isinstance(x, (int, float)) and x > 0]
    return min(xs) if xs else None


def shared_probes(old, new, use_scan):
    """The probe set valid in BOTH artifacts (ADVICE r15: averaging
    different probe sets per artifact silently skews the ratio — the two
    factors would mix absolute scales). `io` is excluded from the window
    factor by design: it measures page-cache STATE, not host speed, and
    is reported separately. Returns (used, dropped)."""
    want = ["cpu_st", "cpu_mt"] + (["scan"] if use_scan else [])
    used = [p for p in want
            if probe_min(old, p) is not None and probe_min(new, p) is not None]
    dropped = [p for p in want if p not in used]
    return used, dropped


def window_factor(art, probes):
    vals = [probe_min(art, p) for p in probes]
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    return math.exp(sum(math.log(v) for v in vals) / len(vals))


def io_state(art):
    """(pre, post) of the io probe, or None — the page-cache diagnostic:
    pre >> post means the artifact's sweep STARTED cold and first-touch
    queries paid real IO that the cpu/scan probes can't price."""
    cal = art.get("calibration")
    if not cal:
        return None
    pre = cal.get("pre", {}).get("io")
    post = cal.get("post", {}).get("io")
    if isinstance(pre, (int, float)) and isinstance(post, (int, float)) \
            and pre > 0 and post > 0:
        return pre, post
    return None


def sf_of(art):
    m = re.search(r"sf([0-9]*\.?[0-9]+)", str(art.get("sf", "")))
    return float(m.group(1)) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--floor", type=float, default=None,
                    help="seconds; queries under this in BOTH artifacts never flag")
    ap.add_argument("--floor-file", dest="floor_file", default=None,
                    help="noise_floor.py artifact whose floor_sec replaces "
                         "the default when --floor is not given; default: "
                         "the per-SF file matching the NEW artifact "
                         "(bench/noise_floor_<sf-tag>.json), falling back "
                         "to the sf0.1 one")
    ap.add_argument("--json", dest="json_out")
    args = ap.parse_args()

    old, new = load_artifact(args.old), load_artifact(args.new)

    # flagging floor: explicit --floor wins; then an explicit floor file;
    # then the measured PER-SF floor matching the NEW artifact's scale
    # (r17, VERDICT r16 item 6: the sf0.1-derived 2.0 s floor was applied
    # at every scale, but sf100's sub-10 s band swings far wider); the
    # sf0.1 file is the fallback, 0.5 s the last-resort legacy value.
    floor_src = "--floor"
    if args.floor is None:
        if args.floor_file:
            # an EXPLICITLY requested floor file that fails to load must
            # error, not silently substitute a different noise band
            try:
                args.floor = float(json.load(open(args.floor_file))["floor_sec"])
                floor_src = args.floor_file
            except (OSError, ValueError, KeyError) as e:
                sys.exit(f"--floor-file {args.floor_file}: unreadable "
                         f"({e}) — fix the path or drop the flag for the "
                         "per-SF default")
        else:
            candidates = []
            m = re.search(r"(sf[0-9]*\.?[0-9]+)", str(new.get("sf", "")))
            if m:
                candidates.append(
                    "bench/noise_floor_%s.json" % m.group(1).replace(".", ""))
            candidates.append("bench/noise_floor_sf01.json")
            for c in candidates:
                try:
                    args.floor = float(json.load(open(c))["floor_sec"])
                    floor_src = c
                    break
                except (OSError, ValueError, KeyError):
                    continue
            if args.floor is None:
                args.floor = 0.5
                floor_src = "legacy default (no floor file)"
    same_sf = sf_of(old) is not None and sf_of(old) == sf_of(new)
    probes, dropped = shared_probes(old, new, use_scan=same_sf)
    w_old = window_factor(old, probes)
    w_new = window_factor(new, probes)
    if w_old and w_new:
        w_ratio = w_new / w_old
        note = ("calibration window ratio new/old = %.3f (probes: %s)"
                % (w_ratio, ", ".join(probes)))
        if dropped:
            note += ("\nWARNING: probe(s) %s missing in at least one "
                     "artifact — dropped from BOTH window factors"
                     % ", ".join(dropped))
    else:
        w_ratio = 1.0
        note = "WARNING: calibration block missing in at least one artifact; norm == raw"

    # IO-state diagnostic (r16): not part of the window factor — it
    # prices cache STATE, not host speed. A sweep whose io pre is a
    # multiple of its post started cold; its early/first-touch queries
    # carry unpriced IO, which mechanically explains same-direction
    # outliers without any engine change.
    io_old, io_new = io_state(old), io_state(new)
    cold_side = None  # +1: new ran colder, -1: old ran colder
    if io_old and io_new:
        cold_o = io_old[0] / io_old[1]
        cold_n = io_new[0] / io_new[1]
        note += ("\nio-state old pre/post = %.2f/%.2f s (cold-factor %.1f)"
                 ", new = %.2f/%.2f s (cold-factor %.1f)"
                 % (io_old[0], io_old[1], cold_o,
                    io_new[0], io_new[1], cold_n))
        if cold_n > 2.0 and cold_n > 2 * cold_o:
            cold_side = 1
            note += "\n  -> NEW sweep started cold; slow-in-new outliers may be IO-state"
        elif cold_o > 2.0 and cold_o > 2 * cold_n:
            cold_side = -1
            note += "\n  -> OLD sweep started cold; fast-in-new 'wins' may be IO-state"
    elif io_old or io_new:
        note += "\nio-state probe present in only one artifact (pre-r16 bench?)"

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
        # an outlier whose direction matches the colder sweep gets the
        # mechanical annotation: its delta is consistent with page-cache
        # state, not engine change
        io_suspect = bool(flag and cold_side is not None
                          and (norm > 1.0) == (cold_side == 1))
        # ref-retried (r16): the NEW sweep already re-sampled this query
        # twice against its reference artifact and the reading held — a
        # slow-in-new outlier here is a twice-reconfirmed in-window cost,
        # not a single-sample swing hit
        ref_retried = bool(flag and norm > 1.0
                           and q in new.get("ref_retried", []))
        rows.append({"query": q, "old_sec": a, "new_sec": b,
                     "raw_ratio": round(raw, 3), "norm_ratio": round(norm, 3),
                     "outlier": flag, "io_suspect": io_suspect,
                     "ref_retried": ref_retried})
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
        flag = "OUTLIER" if r["outlier"] else ""
        if r.get("io_suspect"):
            flag += " (io-state?)"
        if r.get("ref_retried"):
            flag += " (ref-retried)"
        print("| %s | %.2f | %.2f | %.3f | %.3f | %s |" % (
            r["query"], r["old_sec"], r["new_sec"], r["raw_ratio"],
            r["norm_ratio"], flag))
    print()
    if outliers:
        print("outliers (norm ratio beyond %.2fx, >= %.2fs floor from %s): %s" % (
            args.threshold, args.floor, floor_src,
            ", ".join(f"{r['query']} {r['norm_ratio']}" for r in
                      sorted(outliers, key=lambda r: -r["norm_ratio"]))))
    else:
        print(f"no outliers beyond {args.threshold}x "
              f"(floor {args.floor:.2f}s from {floor_src})")

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
