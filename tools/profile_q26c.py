"""q26 A/B: persist x repartition, interleaved reps in one warmed session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dedup import lsh
from dedup.session import get_spark

spark = get_spark("profile_q26c", cores=32)
spark.sparkContext.setLogLevel("ERROR")
from dedup.deploy import ensure_shipped

ensure_shipped(spark)


def build(repart: bool, persist: bool):
    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        F.col("doc_id").cast("string").alias("rep_id"), F.col("text").alias("caption")
    )
    if repart:
        d = d.repartition(32)
    sigs = lsh.with_minhash(d, "caption")
    pairs, _, h = lsh.minhash_candidates(sigs, "rep_id", persist=persist)
    return pairs, h


# throwaway first run to absorb dedup-zip import in workers
p, h = build(True, False)
p.count()
h.unpersist()

import collections

acc = collections.defaultdict(list)
for rep in range(3):
    for repart in (False, True):
        for persist in (False, True):
            t0 = time.time()
            pairs, handle = build(repart, persist)
            n = pairs.count()
            dt = time.time() - t0
            handle.unpersist()
            acc[(repart, persist)].append(dt)
for k, v in sorted(acc.items()):
    print(f"repart={k[0]} persist={k[1]}: {[round(x,2) for x in v]} min={min(v):.2f}")
spark.stop()
