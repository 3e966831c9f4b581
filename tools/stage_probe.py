"""Per-stage scaling decomposition of the engine chain (diagnostic).

Times cumulative plan prefixes (synth / clean / extract / fuse / vote+
promote) with a noop write each, in ONE fresh JVM per parallelism level.
Marginal stage cost ~= diff of consecutive prefixes (lazy recompute, so
prefixes re-run their ancestors — fine for a ratio comparison between two
core counts on the same prefix). Drives the BENCH/BASELINE.md scaling
decomposition; not part of the engine API.

Usage: python tools/stage_probe.py --cores 4 --n-docs 2400000
"""

# NB: no `from __future__ import annotations` (pandas_udf hint resolution)

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, required=True)
    p.add_argument("--n-docs", type=int, default=2_400_000)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from ner_spark import synth
    from ner_spark.operators import consensus as C
    from ner_spark.operators.clean import clean
    from ner_spark.plans.pipeline import KGPipeline
    from ner_spark.session import get_spark

    spark = get_spark(
        "stage_probe", master=f"local[{args.cores}]", shuffle_partitions=args.cores
    )
    gaz = synth.synth_gazetteer(spark)
    pat = synth.synth_patterns(spark)
    combos = [c["slots"] for c in synth.TRUSTED_COMBOS]
    pipe = KGPipeline(gazetteer=gaz, patterns=pat, trusted_combos=combos)

    import pandas as pd

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(args.cores * 4).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    docs = synth.synth_docs(spark, args.n_docs, seed=args.seed)
    cd = clean(docs)
    m = pipe.ranked_mentions(cd)
    fused = C.fuse_ranked(m)
    full = C.promote_trusted(C.priority_vote(fused), combos)

    prefixes = [
        ("synth", docs),
        ("clean", cd),
        ("extract", m),
        ("fuse", fused),
        ("vote_promote", full),
    ]
    for name, df in prefixes:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(
            json.dumps(
                {
                    "prefix": name,
                    "cores": args.cores,
                    "n_docs": args.n_docs,
                    "wall_sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
