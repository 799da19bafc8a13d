"""Isolate the persisted-cache effect on the fused band join (round-6)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dedup import lsh
from dedup.config import DEFAULT as CFG
from dedup.session import get_spark

WH = "/tmp/bench_wh_32"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)
    return out


spark = get_spark("profile_scored", cores=32)
spark.sparkContext.setLogLevel("ERROR")
from dedup.deploy import ensure_shipped

ensure_shipped(spark)
sigs = spark.read.parquet(f"{WH}/signatures")
t("warm", lambda: sigs.count())

mode = sys.argv[1] if len(sys.argv) > 1 else "cached"

if mode == "collisions":
    banded = sigs.select(
        F.col("rep_id").alias("id"),
        F.posexplode(F.expr(lsh.band_keys_expr(CFG))).alias("band", "bh"),
    )
    b = banded.groupBy("band", "bh").agg(F.count("*").alias("n"))
    row = b.agg(
        F.count("*"), F.max("n"), F.sum(F.col("n") * (F.col("n") - 1) / 2)
    ).collect()[0]
    print("buckets:", row)
    sys.exit(0)

pairs, skew, banded = lsh.minhash_scored_band(sigs, "rep_id", CFG, 0, 31, sample_mod=8)
if mode == "cached":
    t("skew collect (materializes cache)", lambda: skew.collect())
    print(pairs._jdf.queryExecution().executedPlan().toString()[:4000])
    t("pairs noop from cache", lambda: noop(pairs))
else:
    print(pairs._jdf.queryExecution().executedPlan().toString()[:4000])
    t("pairs noop no cache", lambda: noop(pairs))
banded.unpersist()
spark.stop()
