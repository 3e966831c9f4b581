"""Summarize /tmp/r3_scaling.jsonl into the BENCH/BASELINE.md tables.

Best-of per (kind, cores); chain efficiency = (dps_hi/dps_lo)/(hi/lo).
Usage: python tools/summarize_scaling.py [path]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_scaling.jsonl"
    probe: dict[tuple[str, int], list[float]] = defaultdict(list)
    chain: dict[int, list[dict]] = defaultdict(list)
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        if "prefix" in rec:
            probe[(rec["prefix"], rec["cores"])].append(rec["wall_sec"])
        elif "wall_sec" in rec and "cores" in rec:
            chain[rec["cores"]].append(rec)

    if probe:
        print("stage-probe ladder (cumulative prefix, 2.4M docs):")
        order = ["synth", "clean", "extract", "fuse", "vote_promote"]
        for pre in order:
            lo = min(probe.get((pre, 4), [float("nan")]))
            hi = min(probe.get((pre, 16), [float("nan")]))
            print(f"  {pre:12s} lo={lo:8.1f}s hi={hi:8.1f}s ratio={lo / hi:5.2f}")

    for cores, recs in sorted(chain.items()):
        walls = [r["wall_sec"] for r in recs]
        print(f"chain cores={cores}: walls={walls} best={min(walls):.1f}")
    if 4 in chain and 16 in chain:
        n = chain[4][0].get("n_docs", 0)
        lo, hi = min(r["wall_sec"] for r in chain[4]), min(
            r["wall_sec"] for r in chain[16]
        )
        dps_lo, dps_hi = n / lo, n / hi
        eff = (dps_hi / dps_lo) / 4.0
        print(
            f"chain {n} docs: lo={lo:.1f}s ({dps_lo:,.0f} dps) "
            f"hi={hi:.1f}s ({dps_hi:,.0f} dps) ratio={dps_hi / dps_lo:.2f} eff={eff:.2f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
