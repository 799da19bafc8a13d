"""q26 variant micro-bench: current self-join vs no-persist vs bucket-groupBy."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dedup import lsh
from dedup.config import DEFAULT as CFG
from dedup.session import get_spark

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time()-t0:.2f}s -> {out}", flush=True)
    return out


spark = get_spark("profile_q26", cores=32)
spark.sparkContext.setLogLevel("ERROR")
from dedup.deploy import ensure_shipped

ensure_shipped(spark)
d = spark.read.parquet(f"{SF}/documents.parquet").select(
    F.col("doc_id").cast("string").alias("rep_id"), F.col("text").alias("caption")
)
t("warm count", lambda: d.count())

variant = sys.argv[1]

if variant == "current":
    sigs = lsh.with_minhash(d, "caption")
    pairs, _, handle = lsh.minhash_candidates(sigs, "rep_id")
    t("q26 current", lambda: pairs.count())
    handle.unpersist()
    sigs2 = lsh.with_minhash(d, "caption")
    pairs2, _, h2 = lsh.minhash_candidates(sigs2, "rep_id")
    t("q26 current again", lambda: pairs2.count())
    h2.unpersist()
elif variant == "nopersist":
    sigs = lsh.with_minhash(d, "caption")
    banded = sigs.select(
        F.col("rep_id").alias("id"),
        F.posexplode(F.expr(lsh.band_keys_expr(CFG))).alias("band", "bh"),
    )
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    t("q26 nopersist", lambda: pairs.count())
    t("q26 nopersist again", lambda: pairs.count())
elif variant == "bucket":
    sigs = lsh.with_minhash(d, "caption")
    banded = sigs.select(
        F.col("rep_id").alias("id"),
        F.posexplode(F.expr(lsh.band_keys_expr(CFG))).alias("band", "bh"),
    )
    grp = banded.groupBy("band", "bh").agg(F.sort_array(F.collect_list("id")).alias("ids")).where(F.size("ids") >= 2)
    pairs = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(ids) - 1), i -> "
                    "transform(slice(ids, i + 1, size(ids) - i), j -> struct(ids[i-1] AS id_a, j AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    t("q26 bucket", lambda: pairs.count())
    t("q26 bucket again", lambda: pairs.count())
spark.stop()
