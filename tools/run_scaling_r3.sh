#!/bin/bash
# Round-3 scaling evidence runner (BENCH/BASELINE.md protocol).
# 1) stage-probe ladder at 4 and 16 cores (2.4M docs) — per-stage decomposition
# 2) 3 interleaved repeats of the 4.8M-doc engine chain at 4 and 16 cores
# All JSON lines append to /tmp/r3_scaling.jsonl; stderr to /tmp/r3_scaling.err.
set -u
cd /root/repo
OUT=/tmp/r3_scaling.jsonl
ERR=/tmp/r3_scaling.err
: > "$OUT"; : > "$ERR"

echo "{\"event\": \"probe_ladder_start\"}" >> "$OUT"
for CORES in 4 16; do
  python tools/stage_probe.py --cores "$CORES" --n-docs 2400000 >> "$OUT" 2>> "$ERR"
done

echo "{\"event\": \"chain_4800k_start\"}" >> "$OUT"
for REP in 1 2 3; do
  for CORES in 4 16; do
    python tools/chain_bench.py --cores "$CORES" --n-docs 4800000 >> "$OUT" 2>> "$ERR"
  done
done
echo "{\"event\": \"done\"}" >> "$OUT"
