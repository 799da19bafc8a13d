"""Measure how much of q01/q26's wall is session warmup a generic warmup job absorbs.

Mode A (control): fresh session -> time q01 then q26 (bench order).
Mode B: fresh session -> generic warmup (JVM codegen + parquet + shuffle +
pandas_udf) -> time q01 then q26.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F, types as T

from dedup import queries as q
from dedup.session import get_spark

SF = "/root/testdata/sf0.1"

mode = sys.argv[1]
t00 = time.time()
spark = get_spark("profile_warmup", cores=32)
spark.sparkContext.setLogLevel("ERROR")
print(f"session up: {time.time()-t00:.2f}s", flush=True)

if mode == "warm":
    t0 = time.time()
    import tempfile

    p = os.path.join(tempfile.gettempdir(), f"warmup_{os.getpid()}.parquet")
    spark.range(0, 10000, 1, 32).selectExpr(
        "id", "cast(id as string) s", "cast(id as double) d"
    ).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    agg = df.groupBy((F.col("id") % 7).alias("g")).agg(
        F.sum("d").alias("sd"), F.count("*").alias("n"), F.min("s").alias("ms")
    )
    df.withColumn("g", F.col("id") % 7).join(
        F.broadcast(agg), "g", "left"
    ).count()

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _w(s: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series([np.arange(3, dtype=np.int64) for _ in s])

    df.select(F.explode(_w(F.col("s")))).write.format("noop").mode("overwrite").save()
    import shutil

    shutil.rmtree(p, ignore_errors=True)
    print(f"warmup: {time.time()-t0:.2f}s", flush=True)

for name in ["q01_pricing_summary", "q26_minhash_candidates", "q29_winnow_substring_pass"]:
    fn, _ = q.REGISTRY[name]
    t0 = time.time()
    n = fn(spark, SF).count()
    print(f"{name}: {time.time()-t0:.2f}s ({n} rows)", flush=True)
spark.stop()
