"""In-memory engine-chain scaling measurement (no checkpoint I/O).

Measures clean -> fused extraction -> one-shuffle consensus -> vote ->
promote over the deterministic synthetic corpus at one parallelism level in
a fresh JVM, printing one JSON line. tools/scaling_bench.py measures the
full checkpointed job (write barriers included); this isolates the engine
chain so the two can be compared (BENCH/BASELINE.md decomposition).

Usage: python tools/chain_bench.py --cores 16 --n-docs 1200000
       (drive both levels + interleaving from a shell loop)
"""

# NB: no `from __future__ import annotations` — it turns the pandas_udf
# type hints into strings that cannot resolve (pd imported in main)

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, required=True)
    p.add_argument("--n-docs", type=int, default=1_200_000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--shuffle-partitions", type=int, default=0,
                   help="0 = same as --cores")
    p.add_argument("--jvm-only", action="store_true",
                   help="skip the pandas-UDF extraction (consensus fixture instead)")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from ner_spark import synth
    from ner_spark.operators import consensus as C
    from ner_spark.operators.clean import clean
    from ner_spark.plans.pipeline import KGPipeline
    from ner_spark.session import get_spark

    spark = get_spark(
        "chain_bench", master=f"local[{args.cores}]",
        shuffle_partitions=args.shuffle_partitions or args.cores
    )
    gaz = synth.synth_gazetteer(spark)
    pat = synth.synth_patterns(spark)
    combos = [c["slots"] for c in synth.TRUSTED_COMBOS]
    pipe = KGPipeline(gazetteer=gaz, patterns=pat, trusted_combos=combos)

    # pay the Python-worker cold start before the measurement on both levels
    import pandas as pd

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(args.cores * 4).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    docs = synth.synth_docs(spark, args.n_docs, seed=args.seed)
    t0 = time.time()
    cd = clean(docs)
    if args.jvm_only:
        m = cd.select(
            "doc_uid",
            F.explode(F.split("text", " ")).alias("NE"),
        ).select(
            "doc_uid", "NE",
            F.lit("X").alias("label"),
            F.lit(0).alias("start"), F.lit(1).alias("end"),
            F.lit("casEN").alias("method"),
            F.lit(None).cast("array<string>").alias("grfs"),
            F.lit("").alias("context"),
            F.pmod(F.xxhash64("NE"), F.lit(3)).cast("int").alias("_rank"),
        )
    else:
        m = pipe.ranked_mentions(cd)
    voted = C.promote_trusted(C.priority_vote(C.fuse_ranked(m)), combos)
    voted.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(json.dumps({
        "cores": args.cores,
        "n_docs": args.n_docs,
        "jvm_only": args.jvm_only,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(args.n_docs / wall, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
