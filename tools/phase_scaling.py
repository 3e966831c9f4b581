"""Phase-aware two-parallelism scaling runner for a bistable hypervisor VM.

The sandbox's effective CPU flips between a clean phase and a throttled
phase (identical jobs vary up to 5x; BENCH/BASELINE.md "hardware
reality"). Naive interleaved repeats waste most samples on throttled
windows. This runner:

1. measures host CPU availability with a short multiprocessing integer
   burn (``burn_probe``; clean phase on this VM: ~150 Mops/s at 16
   procs, throttled: <100),
2. blocks until the probe clears ``--clean-mops`` (or ``--max-wait``
   expires — the run is then annotated, not silently mixed in),
3. runs one lo/hi chain pair back-to-back, CPU-affinity-confined with
   ``taskset`` so "N cores" means N cores: in local[N] mode Spark's N
   Python workers otherwise land on idle cores OUTSIDE the N task
   threads, inflating the lo level and deflating the measured N->4N
   ratio (a real cluster's executor cgroup confines exactly like
   taskset does),
4. stamps every sample with the probe readings before and after, so a
   mid-run phase flip is visible in the record instead of corrupting a
   best-of silently.

Output: JSON lines to stdout (and --out file), one per chain run:
  {"level": 4, "wall_sec": ..., "docs_per_sec": ...,
   "probe_before": ..., "probe_after": ..., "clean": true, ...}

Usage:
  python tools/phase_scaling.py --pairs 3 --n-docs 1200000
  python tools/phase_scaling.py --pairs 2 --n-docs 4800000 --no-confine
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(q, seconds: float) -> None:
    deadline = time.perf_counter() + seconds
    x, ops = 1, 0
    while time.perf_counter() < deadline:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        ops += 100_000
    q.put(ops)


def burn_probe(nproc: int = 16, seconds: float = 3.0) -> float:
    """Total sustained integer Mops/s across ``nproc`` processes."""
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_burn, args=(q, seconds)) for _ in range(nproc)]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    return round(total / wall / 1e6, 1)


def run_level(cores: int, n_docs: int, confine: bool) -> dict:
    cmd = []
    if confine:
        cmd += ["taskset", "-c", f"0-{cores - 1}"]
    cmd += [
        sys.executable,
        os.path.join(REPO, "tools", "chain_bench.py"),
        "--cores",
        str(cores),
        "--n-docs",
        str(n_docs),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, check=True
    ).stdout
    # chain_bench prints exactly one JSON line on stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", type=int, default=3)
    p.add_argument("--n-docs", type=int, default=1_200_000)
    p.add_argument("--lo", type=int, default=4)
    p.add_argument("--hi", type=int, default=16)
    p.add_argument("--clean-mops", type=float, default=120.0)
    p.add_argument("--max-wait", type=float, default=1800.0, help="max seconds to wait per pair for a clean phase")
    p.add_argument("--probe-interval", type=float, default=45.0)
    p.add_argument("--no-confine", action="store_true")
    p.add_argument("--out", default="")
    args = p.parse_args()

    sink = open(args.out, "a") if args.out else None

    def emit(rec: dict) -> None:
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()

    for pair in range(args.pairs):
        waited = 0.0
        probe = burn_probe()
        while probe < args.clean_mops and waited < args.max_wait:
            emit({"event": "throttled_wait", "pair": pair, "probe_mops": probe})
            time.sleep(args.probe_interval)
            waited += args.probe_interval
            probe = burn_probe()
        for level in (args.lo, args.hi):
            before = probe
            res = run_level(level, args.n_docs, not args.no_confine)
            probe = burn_probe()
            emit(
                {
                    "event": "chain",
                    "pair": pair,
                    "level": level,
                    "confined": not args.no_confine,
                    "wall_sec": res["wall_sec"],
                    "docs_per_sec": res["docs_per_sec"],
                    "n_docs": args.n_docs,
                    "probe_before": before,
                    "probe_after": probe,
                    "clean": min(before, probe) >= args.clean_mops,
                }
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
