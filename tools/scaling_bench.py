"""Two-cluster-size scaling protocol (BASELINE.md).

Runs the IDENTICAL pipeline job on the IDENTICAL deterministic input at two
local parallelism levels (the sandbox substitute for N vs 4N executors,
per BASELINE.md) in separate processes (fresh JVMs), and reports docs/sec
at both plus scaling_efficiency = (dps_hi / dps_lo) / (hi/lo cores).

Usage: python tools/scaling_bench.py [--n-docs 400000] [--lo 8] [--hi 32]
Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
from datetime import date


def run_once(cores: int, n_docs: int, n_buckets: int) -> dict:
    out_dir = tempfile.mkdtemp(prefix=f"kg_scale_{cores}_")
    try:
        cmd = [
            sys.executable,
            "run_pipeline.py",
            "--n-docs", str(n_docs),
            "--out", out_dir,
            "--master", f"local[{cores}]",
            "--shuffle-partitions", str(cores),
            "--n-buckets", str(n_buckets),
        ]
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600, check=True
        )
        last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(last)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=400_000)
    p.add_argument("--lo", type=int, default=8)
    p.add_argument("--hi", type=int, default=32)
    p.add_argument("--n-buckets", type=int, default=128)
    args = p.parse_args()

    hi = run_once(args.hi, args.n_docs, args.n_buckets)
    lo = run_once(args.lo, args.n_docs, args.n_buckets)
    ratio = args.hi / args.lo
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    result = {
        "n_docs": args.n_docs,
        "lo_cores": args.lo,
        "hi_cores": args.hi,
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "wall_lo": lo["wall_sec"],
        "wall_hi": hi["wall_sec"],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    stage_rows_lo = "\n".join(
        f"| {s['stage']} | {s['wall_ms']/1000:.1f} | {s['rows']} |"
        for s in lo["stages"]
    )
    with open("BENCH/BASELINE.md", "w", encoding="utf-8") as f:
        f.write(f"""# BENCH — two-parallelism scaling evidence ({date.today().isoformat()})

Protocol (BASELINE.md): identical `run_pipeline.py` job, identical
deterministic input (synthetic interleaved docs, seed=42, n={args.n_docs:,}),
fresh JVM per run, partition count ({args.n_buckets} buckets,
shuffle partitions = core count) scaled with cores. AQE + skew-join on,
`repartition` on doc_uid inside the consensus stage, Arrow batch size fixed.

| cores | wall (s) | docs/sec |
|---|---|---|
| local[{args.lo}] | {lo['wall_sec']} | {lo['docs_per_sec']} |
| local[{args.hi}] | {hi['wall_sec']} | {hi['docs_per_sec']} |

**scaling_efficiency = (dps_{args.hi} / dps_{args.lo}) / {ratio:.0f} = {eff:.3f}**
(target >= 0.8 per BASELINE.json)

Stage walls at local[{args.lo}] (from the per-stage lineage manifests):

| stage | wall (s) | rows |
|---|---|---|
{stage_rows_lo}

Notes
- Single-host local mode: both runs share one VM; "executors" are task
  threads. The job itself is partition-parallel end-to-end (hash buckets of
  doc_uid), so the same binary scales by adding executors on a real
  cluster; nothing in the plan is driver-bound except the tiny dimension
  broadcasts.
- Python-worker cold start (~1-2 s/core, paid once per process) is included
  in both walls — it is the 4N run's main fixed cost at this input size.
""")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
