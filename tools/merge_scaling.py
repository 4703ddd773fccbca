#!/usr/bin/env python3
"""Merge per-batch scaling summaries into one combined headline.

usage: merge_scaling.py <out.json> <scaling_summary.json>...

The headline is the MEDIAN efficiency over ALL probe-qualified pairs across
the given batches (no per-batch selection): the same rule round 4 applied by
hand over scaling_r4 + scaling_r4b.
"""
import json
import statistics
import sys


def main() -> None:
    out, inputs = sys.argv[1], sys.argv[2:]
    batches = []
    rows = []
    for path in inputs:
        s = json.load(open(path))
        batches.append({
            "tag": s["tag"],
            "probe_calibration_s": s["probe_calibration_s"],
            "pairs": len(s["pairs"]),
            "qualified": s["qualified"],
            "median_qualified_eff": s["median_qualified_eff"],
        })
        for p in s["pairs"]:
            rows.append({**p, "batch": s["tag"]})
    qual = sorted(r["eff"] for r in rows if r["qualified"])
    summary = {
        "batches": batches,
        "pairs": rows,
        "qualified": len(qual),
        "qualified_effs": [round(e, 3) for e in qual],
        "median_qualified_eff": statistics.median(qual) if qual else None,
        "pairs_ge_0.8": sum(1 for e in qual if e >= 0.8),
    }
    json.dump(summary, open(out, "w"), indent=1)
    print(json.dumps(summary["batches"], indent=1))
    print(f"combined: {len(qual)} qualified, median "
          f"{summary['median_qualified_eff']:.3f}, "
          f">=0.8 in {summary['pairs_ge_0.8']}/{len(qual)}")


if __name__ == "__main__":
    main()
