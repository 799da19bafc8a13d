"""Fused band join: SMJ vs shuffle_hash, 3 reps each, warmed session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dedup import lsh
from dedup.config import DEFAULT as CFG
from dedup.session import get_spark

spark = get_spark("profile_scored2", cores=32)
spark.sparkContext.setLogLevel("ERROR")

sigs = spark.read.parquet("/tmp/bench_wh_32/signatures")
sigs.count()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def fused(hint: str | None):
    banded = sigs.select(
        F.col("rep_id").alias("id"),
        F.col("shingles"),
        F.posexplode(F.expr(lsh.band_keys_expr(CFG))).alias("band", "bh"),
    )
    a = banded.alias("a")
    b = (banded.hint(hint) if hint else banded).alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    score = inter.cast("double") / (
        F.size(F.col("a.shingles")) + F.size(F.col("b.shingles")) - inter
    )
    keep = (score >= F.lit(CFG.jaccard_threshold)) | (
        F.pmod(F.xxhash64(F.col("a.id"), F.col("b.id")), F.lit(8)) == 0
    )
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .where(F.col("a.id") < F.col("b.id"))
        .where(keep)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), score.alias("score"))
        .distinct()
    )


# absorb first-query effects
noop(fused(None))
import collections

acc = collections.defaultdict(list)
for rep in range(3):
    for hint in (None, "shuffle_hash"):
        t0 = time.time()
        noop(fused(hint))
        acc[hint or "smj"].append(round(time.time() - t0, 2))
for k, v in acc.items():
    print(f"{k}: {v} min={min(v):.2f}")
spark.stop()
