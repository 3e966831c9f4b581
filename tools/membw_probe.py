"""Aggregate memory-bandwidth probe (numpy copy) at several process counts.

The engine chain is string/Arrow heavy: the extraction stage moves Arrow
batches JVM->Python and manipulates pandas string arrays, so its scaling
ceiling on ONE node is the node's memory bandwidth, not core count. This
probe measures sustained aggregate copy bandwidth at 1/4/16 processes: if
16 procs move barely more bytes/s than 4, a 4x core scale-up CANNOT show
4x throughput for a bandwidth-bound stage on this box — while a real
cluster adds a memory controller with every node.

Usage: python tools/membw_probe.py [--mb 256] [--seconds 4]
Prints one JSON line: {"procs": {"1": GBs, "4": GBs, "16": GBs}}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _copy(q, mb: int, seconds: float) -> None:
    import numpy as np

    src = np.random.bytes(mb * 1024 * 1024)
    a = np.frombuffer(src, dtype=np.uint8).copy()
    b = np.empty_like(a)
    deadline = time.perf_counter() + seconds
    n = 0
    while time.perf_counter() < deadline:
        np.copyto(b, a)
        np.copyto(a, b)
        n += 2
    q.put(n * a.nbytes)


def measure(nproc: int, mb: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_copy, args=(q, mb, seconds)) for _ in range(nproc)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    return round(total / wall / 1e9, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--procs", default="1,4,16")
    args = ap.parse_args()
    out = {}
    for n in [int(x) for x in args.procs.split(",")]:
        out[str(n)] = measure(n, args.mb, args.seconds)
    print(json.dumps({"metric": "copy_gb_per_sec", "procs": out, "mb_per_proc": args.mb}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
