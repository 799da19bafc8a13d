"""Round-6 profiling harness: time each pipeline stage IN ISOLATION on the
bench's own 60k synthetic images (reusing the committed /tmp/bench_wh_32
warehouse stages as inputs), with per-action walls and Spark REST metrics.

Not part of the bench contract — measurement only (guide §1).
Usage: python tools/profile_r06.py [stage ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dedup import lsh, verify
from dedup.config import DEFAULT as CFG
from dedup.session import get_spark

WH = "/tmp/bench_wh_32"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"[{time.strftime('%H:%M:%S')}] {label}: {time.time()-t0:.2f}s", flush=True)
    return out


def rest(spark, path):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}/{path}"
    return json.loads(urllib.request.urlopen(url, timeout=5).read())


def main():
    which = set(sys.argv[1:]) or {"sigs", "scored", "substr", "simhash", "keys", "reps"}
    spark = get_spark("profile_r06", cores=32, extra={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    from dedup.deploy import ensure_shipped

    ensure_shipped(spark)
    keys = spark.read.parquet(f"{WH}/keys")
    sigs = spark.read.parquet(f"{WH}/signatures")
    t("warm: keys count", lambda: keys.count())
    t("warm: sigs count", lambda: sigs.count())

    if "keys" in which:
        import dedup.imaging as imaging
        import pandas as pd

        images = spark.read.parquet("/tmp/bench_images_60000.parquet")
        t("keys: raw scan noop", lambda: noop(images))
        with_sha = images.withColumn("sha", F.sha2(F.col("bytes"), 256))

        def check(batches):
            for pdf in batches:
                res = [
                    imaging.verify_row_fidelity(b, f, w, h, p, CFG.psnr_min_db)
                    for b, f, w, h, p in zip(pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"], pdf["phash"])
                ]
                yield pd.DataFrame(
                    {
                        "image_id": pdf["image_id"],
                        "sha": pdf["sha"],
                        "caption": pdf["caption"],
                        "phash": pdf["phash"],
                        "decode_ok": [r[0] for r in res],
                        "phash_ok": [r[1] for r in res],
                    }
                )

        out = with_sha.mapInPandas(
            check,
            "image_id string, sha string, caption string, phash long, decode_ok boolean, phash_ok boolean",
        )
        t("keys: sha+fidelity mapInPandas noop", lambda: noop(out))
        t("keys: sha only noop", lambda: noop(with_sha.select("image_id", "sha", "caption", "phash")))

    if "reps" in which:
        from dedup.pipeline import exact_member_edges

        t("reps: edges noop (corpus_rows known)", lambda: noop(exact_member_edges(keys, corpus_rows=60000)))

    if "sigs" in which:
        dp = spark.sparkContext.defaultParallelism
        uniq = keys.groupBy("caption").agg(F.min("image_id").alias("rep_id"))
        t("sigs: uniq captions only noop", lambda: noop(uniq))
        up = uniq.repartition(dp * 2)
        s1 = lsh.with_shingles(lsh.with_minhash(up, "caption", CFG), "caption", CFG)
        t("sigs: uniq+repart+mh+sh noop", lambda: noop(s1))
        t("sigs: again (warm)", lambda: noop(s1))
        # write+read cost
        t("sigs: write parquet", lambda: s1.write.mode("overwrite").parquet("/tmp/prof_sigs.parquet"))

    if "scored" in which:
        pairs, skew, banded = lsh.minhash_scored_band(sigs, "rep_id", CFG, 0, 31, sample_mod=CFG.metrics_inter_sample_mod)
        t("scored: skew collect", lambda: skew.collect())
        t("scored: pairs noop", lambda: noop(pairs))
        banded.unpersist()
        # without persist / skew: raw fused join only
        pairs2, _, banded2 = lsh.minhash_scored_band(sigs, "rep_id", CFG, 0, 31, sample_mod=CFG.metrics_inter_sample_mod)
        t("scored: pairs noop (no skew action first)", lambda: noop(pairs2))
        banded2.unpersist()

    if "substr" in which:
        e = verify.substring_edges(sigs.select("rep_id", "caption"), "rep_id", "caption", CFG)
        t("substr: edges noop", lambda: noop(e))
        t("substr: edges noop again", lambda: noop(e))

    if "simhash" in which:
        uniq_ph = keys.groupBy("phash").agg(F.min("image_id").alias("rep_id")).persist()
        t("simhash: uniq_ph count", lambda: uniq_ph.count())
        c = lsh.phash_candidates(uniq_ph, "rep_id", "phash", CFG)
        t("simhash: candidates noop", lambda: noop(c))
        t("simhash: candidates noop again", lambda: noop(c))
        uniq_ph.unpersist()

    # dump stage-level metrics
    try:
        stages = rest(spark, "stages?status=complete")
        rows = []
        for s in stages:
            rows.append(
                (
                    s["stageId"],
                    s["name"].split("\n")[0][:60],
                    s["numCompleteTasks"],
                    round(s.get("executorRunTime", 0) / 1000, 1),
                    round(s.get("executorCpuTime", 0) / 1e9, 1),
                    round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                )
            )
        rows.sort(key=lambda r: -r[3])
        print("\nstageId name tasks runtime_s cpu_s shufW_MB")
        for r in rows[:25]:
            print(*r)
    except Exception as e:
        print("REST failed:", e)
    spark.stop()


if __name__ == "__main__":
    main()
