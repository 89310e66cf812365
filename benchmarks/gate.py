"""Accuracy/time regression gate (the reference CI's alert semantics:
.github/workflows/benchmark.yml:104-131 — fail when a tracked metric
regresses more than the tolerance vs the committed baseline).

    python -m benchmarks.gate results.json benchmarks/baseline.json \
        [--tolerance 0.05] [--update]

Gated metrics: per-category mean SP and TC (lower is worse).  Total
wall time WARNS by default (CI machines are slower/noisier than the
box that produced the committed baseline); pass --gate-time to fail on
it too (2x tolerance).  --update rewrites the baseline from the
results file.
"""

import argparse
import json
import sys


def compare(results, baseline, tolerance):
    failures = []
    base_cats = {c["category"]: c for c in baseline.get("categories", [])}
    for cat in results.get("categories", []):
        b = base_cats.get(cat["category"])
        if b is None:
            continue
        for metric in ("mean_sp", "mean_tc"):
            cur, ref = cat[metric], b[metric]
            if ref > 0 and cur < ref * (1.0 - tolerance):
                failures.append(
                    f"{cat['category']}: {metric} {cur:.4f} < "
                    f"{ref:.4f} - {tolerance:.0%}")
    return failures


def wall_warnings(results, baseline, tolerance):
    """Wall time is machine-dependent (a CI runner is slower and
    noisier than the box that produced the committed baseline), so it
    warns by default; gate it with --gate-time on stable hardware."""
    bs = baseline.get("summary", {})
    rs = results.get("summary", {})
    if bs.get("total_wall_s") and rs.get("total_wall_s"):
        if rs["total_wall_s"] > bs["total_wall_s"] * (1.0 + 2 * tolerance):
            return [f"total_wall_s {rs['total_wall_s']} > "
                    f"{bs['total_wall_s']} + {2 * tolerance:.0%}"]
    return []


def main(argv=None):
    p = argparse.ArgumentParser(prog="benchmarks.gate")
    p.add_argument("results")
    p.add_argument("baseline")
    p.add_argument("--tolerance", type=float, default=0.05)
    p.add_argument("--gate-time", action="store_true",
                   help="treat wall-time regressions as failures too")
    p.add_argument("--update", action="store_true",
                   help="rewrite the baseline from the results file")
    args = p.parse_args(argv)

    results = json.load(open(args.results))
    if args.update:
        slim = dict(categories=results["categories"],
                    summary=results["summary"],
                    engine=results.get("engine"),
                    mode=results.get("mode"))
        with open(args.baseline, "w") as fh:
            json.dump(slim, fh, indent=1)
        print(f"baseline updated: {args.baseline}")
        return 0
    baseline = json.load(open(args.baseline))
    if (baseline.get("engine") and results.get("engine")
            and baseline["engine"] != results["engine"]):
        # engines have DOCUMENTED per-category differences (tpu-fast's
        # score-optimal ties vs the host's Hirschberg paths diverge
        # most on low-identity DNA); cross-engine comparisons mislead —
        # each engine gates against its own committed baseline
        # (benchmarks/baseline.json = host,
        #  benchmarks/baseline_tpu-fast.json = tpu-fast)
        print(f"WARNING: baseline engine {baseline['engine']!r} != "
              f"results engine {results['engine']!r}; cross-engine "
              f"category gating is not meaningful — use the matching "
              f"baseline file")
    failures = compare(results, baseline, args.tolerance)
    warns = wall_warnings(results, baseline, args.tolerance)
    if args.gate_time:
        failures += warns
    elif warns:
        for w in warns:
            print("WARNING (not gated):", w)
    if failures:
        print("REGRESSION GATE FAILED:")
        for f in failures:
            print(" ", f)
        return 1
    print(f"gate OK ({len(results.get('categories', []))} categories, "
          f"tolerance {args.tolerance:.0%})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
