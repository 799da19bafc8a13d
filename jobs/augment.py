"""spark-submit entry for disco-style training-pair augmentation
(dedup/augment.py; reference /root/reference/eridu/etl/disco.py).

Reads a table with a name column, emits the 15-column labeled pairs table
(corporate-ending swap matches / non-matches) as parquet.

Production launch:

    spark-submit --py-files dedup_pkg.zip jobs/augment.py \
        --input warehouse/names --output warehouse/pairs-disco \
        [--name-col name] [--cores N]

Deterministic: every choice is an md5-bit-field of the basename, so re-runs
(and any partitioning) produce the identical table — the seeded-RNG contract
of the reference without driver-side state. One JSON metrics line (pairs,
match/non-match counts) prints to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet with the names column")
    ap.add_argument("--output", required=True, help="output pairs parquet dir")
    ap.add_argument("--name-col", default="name")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dedup.augment import disco_pairs
    from dedup.session import get_spark

    spark = get_spark("augment", cores=args.cores)
    try:
        t0 = time.time()
        pairs = disco_pairs(spark.read.parquet(args.input), args.name_col)
        pairs.write.mode("overwrite").parquet(args.output)
        out = spark.read.parquet(args.output)
        counts = {
            r["match"]: r["n"]
            for r in out.groupBy("match").agg(F.count("*").alias("n")).collect()
        }
        print(json.dumps({
            "pairs": sum(counts.values()),
            "matches": counts.get(True, 0),
            "non_matches": counts.get(False, 0),
            "wall_sec": round(time.time() - t0, 2),
            "output": args.output,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
