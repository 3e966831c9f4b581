"""Certify scaling pairs from phase_gated_scaling proto logs.

A pair is CERTIFIED when every probe edge around its two legs is in-band:
memcpy >= --min-gbps AND cpu-burn >= --min-cpu at (before lo, after lo =
before hi, after hi). The pair record stores probe_before/cpu_before and
each run stores probe_after/cpu_after, so all three edges are checked.

Prints one line per pair (eff, walls, edges, certified) and the summary
the north rule asks for: certified effs sorted, their median, and the
pass/fail of median >= 0.8.

Usage: python tools/certify_pairs.py [--min-gbps 2] [--min-cpu 28] log1 [log2 ...]
"""

from __future__ import annotations

import argparse
import json
import statistics


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+")
    p.add_argument("--min-gbps", type=float, default=2.0)
    p.add_argument("--min-cpu", type=float, default=28.0)
    args = p.parse_args()

    certified, all_effs = [], []
    for path in args.logs:
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if r.get("ev") != "pair":
                continue
            runs = {x["cores"]: x for x in r["runs"]}
            cores = sorted(runs)
            if len(cores) != 2 or not all(runs[c].get("result") for c in cores):
                continue
            lo, hi = cores
            res_lo, res_hi = runs[lo]["result"], runs[hi]["result"]
            eff = (res_hi["docs_per_sec"] / res_lo["docs_per_sec"]) / (hi / lo)
            edges = [
                (r.get("probe_before"), r.get("cpu_before")),
                (runs[lo].get("probe_after"), runs[lo].get("cpu_after")),
                (runs[hi].get("probe_after"), runs[hi].get("cpu_after")),
            ]
            ok = all(
                g is not None and c is not None
                and g >= args.min_gbps and c >= args.min_cpu
                for g, c in edges
            )
            all_effs.append(eff)
            if ok:
                certified.append(eff)
            edge_s = " ".join(
                f"{'?' if g is None else round(g, 1)}/{'?' if c is None else round(c, 1)}"
                for g, c in edges
            )
            print(
                f"{path.split('/')[-1]}: eff={eff:.3f} "
                f"walls={res_lo['wall_sec']:.0f}/{res_hi['wall_sec']:.0f}s "
                f"edges[gbps/cpu]=({edge_s}) {'CERTIFIED' if ok else 'dirty'}"
            )
    if certified:
        med = statistics.median(certified)
        print(
            f"\ncertified: {len(certified)}/{len(all_effs)} pairs, effs="
            f"{sorted(round(e, 3) for e in certified)}, median={med:.3f}, "
            f"median>=0.8: {'PASS' if med >= 0.8 else 'FAIL'}"
        )
    else:
        print(f"\nno certified pairs out of {len(all_effs)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
