"""Phase-gated scaling pairs: only measure when the VM is actually awake.

The hypervisor throttles this box bistably (single-proc memcpy swings
0.01 -> 7.5 GB/s within minutes; see BENCH/BASELINE.md "hardware reality").
A scaling pair measured across a phase flip is noise, so this driver:

1. probes single-proc memcpy bandwidth (pure numpy, no JVM);
2. if the phase is fast (>= --min-gbps), runs ONE interleaved lo/hi
   chain-bench pair, probing again after each run;
3. stamps every measurement with the surrounding probe values so a pair
   whose phase flipped mid-run is visibly discardable;
4. repeats until --pairs clean pairs are captured or --budget-sec is spent.

Output: one JSON line per event (probe / run / pair) appended to --log.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_gbps(seconds: float = 3.0) -> float:
    a = np.zeros(8_000_000)
    b = np.ones(8_000_000)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(a, b)
        n += 1
    return n * 64_000_000 / (time.time() - t0) / 1e9


def run_level(cores: int, n_docs: int, timeout: int) -> dict | None:
    cmd = [
        sys.executable,
        os.path.join(ROOT, "tools", "chain_bench.py"),
        "--cores",
        str(cores),
        "--n-docs",
        str(n_docs),
    ]
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout
        ).stdout.strip().splitlines()
        return json.loads(out[-1]) if out else None
    except (subprocess.TimeoutExpired, json.JSONDecodeError, IndexError):
        return None


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--lo", type=int, default=4)
    p.add_argument("--hi", type=int, default=16)
    p.add_argument("--n-docs", type=int, default=4_800_000)
    p.add_argument("--min-gbps", type=float, default=2.0)
    p.add_argument("--pairs", type=int, default=2)
    p.add_argument("--budget-sec", type=int, default=5400)
    p.add_argument("--run-timeout", type=int, default=1500)
    p.add_argument("--log", default=os.path.join(ROOT, "BENCH", "phase_scaling.jsonl"))
    args = p.parse_args()

    os.makedirs(os.path.dirname(args.log), exist_ok=True)

    def log(obj: dict) -> None:
        obj["t"] = round(time.time(), 1)
        with open(args.log, "a") as f:
            f.write(json.dumps(obj) + "\n")
        print(json.dumps(obj), flush=True)

    t_start = time.time()
    clean = 0
    while clean < args.pairs and time.time() - t_start < args.budget_sec:
        g0 = probe_gbps()
        log({"ev": "probe", "gbps": round(g0, 3)})
        if g0 < args.min_gbps:
            time.sleep(120)
            continue
        pair: dict = {"ev": "pair", "probe_before": round(g0, 3), "runs": []}
        ok = True
        for cores in (args.lo, args.hi):
            r = run_level(cores, args.n_docs, args.run_timeout)
            g = probe_gbps()
            log({"ev": "run", "cores": cores, "result": r, "probe_after": round(g, 3)})
            if r is None or g < args.min_gbps:
                ok = False
                pair["runs"].append({"cores": cores, "result": r, "probe_after": round(g, 3)})
                break
            pair["runs"].append({"cores": cores, "result": r, "probe_after": round(g, 3)})
        if ok and len(pair["runs"]) == 2:
            lo_s = pair["runs"][0]["result"]["wall_sec"]
            hi_s = pair["runs"][1]["result"]["wall_sec"]
            ratio = lo_s / hi_s
            eff = ratio / (args.hi / args.lo)
            pair.update({"speedup": round(ratio, 3), "efficiency": round(eff, 3), "clean": True})
            clean += 1
        else:
            pair["clean"] = False
        log(pair)
    log({"ev": "done", "clean_pairs": clean})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
