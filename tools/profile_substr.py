"""Decompose substring_edges cost on the pipeline's signatures table."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F, types as T

from dedup import signatures, verify
from dedup.config import DEFAULT as CFG
from dedup.session import get_spark

spark = get_spark("profile_substr", cores=32)
spark.sparkContext.setLogLevel("ERROR")
from dedup.deploy import ensure_shipped

ensure_shipped(spark)


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


sigs = spark.read.parquet("/tmp/bench_wh_32/signatures").select("rep_id", "caption")
t("warm", lambda: sigs.count())
print("max caption len:", sigs.agg(F.max(F.length("caption"))).first()[0])

dp = spark.sparkContext.defaultParallelism


@F.pandas_udf(T.ArrayType(T.LongType()))
def _wf(s: pd.Series) -> pd.Series:
    return signatures.batch_winnow(s, CFG)


@F.pandas_udf(T.LongType())
def _minfp(s: pd.Series) -> pd.Series:
    return signatures.batch_min_kgram(s, CFG)


_minfp = _minfp.asNondeterministic()


def norm(df):
    return df.select(F.col("rep_id").alias("id"), F.lower(F.col("caption")).alias("caption")).repartition(dp * 2)


containers = norm(sigs).select(
    "id", "caption", F.length("caption").alias("len"), F.explode(_wf(F.col("caption"))).alias("fp")
)
fragments = norm(sigs).select(
    "id", "caption", F.length("caption").alias("len"), _minfp(F.col("caption")).alias("fp")
).where(F.col("fp").isNotNull() & (F.col("len") >= CFG.substr_min_len))

t("containers noop", lambda: noop(containers))
t("fragments noop", lambda: noop(fragments))
a, b = containers.alias("a"), fragments.alias("b")
raw = (
    a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") != F.col("b.id")))
    .where(F.col("b.len") <= F.col("a.len"))
    .select(
        F.col("a.id").alias("cid"), F.col("b.id").alias("fid"),
        F.col("a.caption").alias("c_cap"), F.col("b.caption").alias("f_cap"),
        F.col("a.len").alias("c_len"),
    )
)
t("raw join noop", lambda: noop(raw))
short = raw.where(F.col("c_len") < 2048).where(F.instr(F.col("c_cap"), F.col("f_cap")) > 0).select("cid", "fid")
t("short branch noop", lambda: noop(short))
t("full substring_edges noop", lambda: noop(verify.substring_edges(sigs, "rep_id", "caption", CFG)))
t("full substring_edges noop again", lambda: noop(verify.substring_edges(sigs, "rep_id", "caption", CFG)))

# variant: no repartition at all
def norm2(df):
    return df.select(F.col("rep_id").alias("id"), F.lower(F.col("caption")).alias("caption"))


c2 = norm2(sigs).select("id", "caption", F.length("caption").alias("len"), F.explode(_wf(F.col("caption"))).alias("fp"))
f2 = norm2(sigs).select("id", "caption", F.length("caption").alias("len"), _minfp(F.col("caption")).alias("fp")).where(
    F.col("fp").isNotNull() & (F.col("len") >= CFG.substr_min_len)
)
a2, b2 = c2.alias("a"), f2.alias("b")
raw2 = (
    a2.join(b2, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") != F.col("b.id")))
    .where(F.col("b.len") <= F.col("a.len"))
    .select(F.col("a.id").alias("cid"), F.col("b.id").alias("fid"),
            F.col("a.caption").alias("c_cap"), F.col("b.caption").alias("f_cap"), F.col("a.len").alias("c_len"))
)
short2 = raw2.where(F.col("c_len") < 2048).where(F.instr(F.col("c_cap"), F.col("f_cap")) > 0).select("cid", "fid")
t("short branch noop NO repartition", lambda: noop(short2))
spark.stop()
