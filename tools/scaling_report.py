#!/usr/bin/env python3
"""Per-entry scale study: compare two Bench artifacts a decade apart.

Usage: scaling_report.py BENCH_SF01.json BENCH_SF1.json [out.json]

Reads the per-query steady seconds from both artifacts and reports, per
entry, the ratio t_big / t_small next to the data scale factor (10x).
An entry is FLAGGED superlinear when its ratio exceeds FLAG_RATIO and
its big-SF time is large enough to matter (small entries are fixed-cost
dominated: a 0.2 s -> 0.9 s move is scheduling noise, not an algorithm).

The honest-denominator caveat: entries faster than OVERHEAD_FLOOR at the
small SF are dominated by fixed per-job cost (stage scheduling, codegen
cache checks ~0.1-0.3 s), so their ratios UNDERSTATE the data-dependent
scaling; they are reported in a separate band rather than pretending the
ratio is an exponent.
"""
import json, sys, math

FLAG_RATIO = 15.0      # > 1.5x the 10x data growth
MATTER_SEC = 5.0       # big-SF seconds below this can't bottleneck a round
OVERHEAD_FLOOR = 0.30  # small-SF entries under this are fixed-cost dominated

def load(p):
    d = json.load(open(p))
    return d["queries"], d

def main():
    small_q, small_d = load(sys.argv[1])
    big_q, big_d = load(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else None
    common = sorted(set(small_q) & set(big_q))
    missing = sorted(set(small_q) ^ set(big_q))
    rows = []
    for name in common:
        a, b = small_q[name], big_q[name]
        ratio = b / a if a > 0 else float("inf")
        rows.append({
            "name": name, "t_small": round(a, 3), "t_big": round(b, 3),
            "ratio": round(ratio, 2),
            "overhead_dominated": a < OVERHEAD_FLOOR,
        })
    rows.sort(key=lambda r: -r["ratio"])
    flagged = [r for r in rows
               if r["ratio"] > FLAG_RATIO and r["t_big"] > MATTER_SEC]
    watch = [r for r in rows
             if r["ratio"] > FLAG_RATIO and r["t_big"] <= MATTER_SEC
             and not r["overhead_dominated"]]
    meaningful = [r for r in rows if not r["overhead_dominated"]]
    med = sorted(r["ratio"] for r in meaningful)[len(meaningful)//2] if meaningful else None
    rep = {
        "small_sf": small_d.get("sf"), "big_sf": big_d.get("sf"),
        "small_total": round(small_d.get("value", 0), 1),
        "big_total": round(big_d.get("value", 0), 1),
        "entries": len(common), "missing_either": missing,
        "flag_rule": f"ratio > {FLAG_RATIO} AND t_big > {MATTER_SEC}s",
        "median_ratio_meaningful": med,
        "flagged_superlinear": flagged,
        "watchlist_small_but_superlinear": watch,
        "top30_by_ratio": rows[:30],
        "top20_by_big_time": sorted(rows, key=lambda r: -r["t_big"])[:20],
    }
    txt = json.dumps(rep, indent=1)
    if out:
        open(out, "w").write(txt + "\n")
    print(txt)

if __name__ == "__main__":
    main()
