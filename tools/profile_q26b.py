"""Is q26's minhash UDF single-partition? Time UDF alone vs repartitioned."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dedup import lsh
from dedup.config import DEFAULT as CFG
from dedup.session import get_spark

spark = get_spark("profile_q26b", cores=32)
spark.sparkContext.setLogLevel("ERROR")
from dedup.deploy import ensure_shipped

ensure_shipped(spark)


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s -> {out}", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
    F.col("doc_id").cast("string").alias("rep_id"), F.col("text").alias("caption")
)
print("input partitions:", d.rdd.getNumPartitions())
t("warm", lambda: d.count())
sigs1 = lsh.with_minhash(d, "caption")
t("udf 1-part noop", lambda: noop(sigs1))
t("udf 1-part noop again", lambda: noop(sigs1))
sigs2 = lsh.with_minhash(d.repartition(64), "caption")
t("udf 64-part noop", lambda: noop(sigs2))
t("udf 64-part noop again", lambda: noop(sigs2))

# full q26 with repartition before UDF
pairs, _, h = lsh.minhash_candidates(sigs2, "rep_id")
t("q26 repart64 count", lambda: pairs.count())
h.unpersist()
pairs2, _, h2 = lsh.minhash_candidates(lsh.with_minhash(d.repartition(64), "caption"), "rep_id")
t("q26 repart64 count again", lambda: pairs2.count())
h2.unpersist()
spark.stop()
