"""spark-submit entry for training-data curation over a documents table —
the standard LLM pre-training recipe, staged from cheapest to most
expensive so each filter shrinks the next one's input:

  1. quality:         Gopher repetition filters (dedup/quality.py) — one
                      scan, per-row expressions, no shuffle
  2. decontamination: word-n-gram overlap vs an eval-benchmark table
                      (verify.flag_contaminated_ngrams) — broadcast
                      join-as-filter, no corpus-n-gram shuffle
  3. semantic dedup:  SemDeDup over an embeddings table
                      (ann.semantic_dedup) — keep one exemplar per
                      semantic-duplicate group

Production launch:

    spark-submit --py-files dedup_pkg.zip jobs/curate.py \
        --documents warehouse/docs --output warehouse/curated \
        [--benchmark bench.parquet] [--embeddings emb.parquet] \
        [--cores N] [--ngram-n 8] [--cosine-threshold 0.9] [--nprobe 1]

Stages 2 and 3 engage only when their side table is supplied. The output
parquet carries the SURVIVING documents plus per-row quality stats and,
when semantic dedup ran, the cluster id each kept exemplar represents.
One JSON metrics line (rows in/out per stage) prints to stdout."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True, help="parquet with (doc_id, text)")
    ap.add_argument("--output", required=True, help="curated output parquet dir")
    ap.add_argument("--benchmark", default=None,
                    help="parquet with (bench_id, fragment): enables decontamination")
    ap.add_argument("--embeddings", default=None,
                    help="parquet with (vec_id, embedding), vec_id == doc_id: "
                         "enables semantic dedup")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox)")
    ap.add_argument("--max-dup-word-frac", type=float, default=0.5)
    ap.add_argument("--max-dup-5gram-frac", type=float, default=0.05)
    ap.add_argument("--ngram-n", type=int, default=8)
    ap.add_argument("--cosine-threshold", type=float, default=0.9)
    ap.add_argument("--nprobe", default="1",
                    help="semantic-dedup probe count: an int or 'auto' (~30%% of "
                         "cells — the unstructured-embedding fallback; 1 is the "
                         "published SemDeDup regime for clustered corpora)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="replace emails/phones in surviving docs with typed "
                         "placeholders (quality.redact_pii) and carry the counts")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dedup.quality import repetition_stats
    from dedup.session import get_spark

    spark = get_spark("curate", cores=args.cores)
    try:
        t0 = time.time()
        docs = spark.read.parquet(args.documents)
        metrics: dict = {"rows_in": docs.count()}

        # ---- 1. quality (cheapest first: per-row expressions, no shuffle)
        stats = repetition_stats(
            docs, "doc_id", "text", ngram_n=5,
            max_dup_word_frac=args.max_dup_word_frac,
            max_dup_ngram_frac=args.max_dup_5gram_frac,
        )
        kept = docs.join(stats.where(F.col("keep") == 1).drop("keep"), "doc_id")
        metrics["after_quality"] = kept.count()

        # ---- 2. decontamination (drop docs overlapping the benchmark)
        if args.benchmark:
            from dedup.verify import flag_contaminated_ngrams

            bench = spark.read.parquet(args.benchmark)
            flagged = flag_contaminated_ngrams(kept, bench, n=args.ngram_n)
            # no broadcast hint: the flagged set is usually tiny (AQE will
            # broadcast it), but an adversarially contaminated corpus can
            # flag billions of rows — a forced broadcast would OOM the
            # driver exactly when decontamination matters most
            kept = kept.join(flagged.select("doc_id"), "doc_id", "left_anti")
            metrics["after_decontamination"] = kept.count()

        # ---- 3. semantic dedup (keep one exemplar per near-dup group)
        if args.embeddings:
            from dedup.ann import semantic_dedup
            from dedup.deploy import ensure_shipped

            ensure_shipped(spark)  # cell-assignment Arrow UDF runs on workers
            emb = spark.read.parquet(args.embeddings).join(
                kept.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
            )
            nprobe = args.nprobe if args.nprobe == "auto" else int(args.nprobe)
            # connected_components roots clusters at the STRING-min id, and
            # the keep flag compares ids as strings — zero-pad the numeric
            # ids (19 digits covers any non-negative long, so string order
            # == numeric order; e.g. cluster {2, 10} keeps doc 2, not 10)
            # and map back to longs after. Same recipe as q57.
            asg = semantic_dedup(
                emb.select(
                    F.format_string("v%019d", F.col("vec_id")).alias("vec_id"),
                    "embedding",
                ),
                threshold=args.cosine_threshold, nprobe=nprobe,
                id_col="vec_id", vec_col="embedding",
            ).select(
                F.substring("vec_id", 2, 19).cast("long").alias("doc_id"),
                F.substring("cluster_id", 2, 19).cast("long").alias("cluster_id"),
                "keep",
            )
            # drop NON-exemplar members; docs WITHOUT an embedding row are
            # not semantic-dup evidence and survive (anti join on the drop
            # set, not inner join on the keep set). cluster_id rides along
            # for kept exemplars so downstream sees what each row represents.
            kept = kept.join(
                asg.where(F.col("keep") == 0).select("doc_id"),
                "doc_id", "left_anti",
            ).join(
                asg.select("doc_id", "cluster_id"),
                "doc_id", "left",
            )
            metrics["after_semantic_dedup"] = kept.count()

        # ---- 4. PII redaction (a transformation of the survivors, not a
        # filter — runs last so it never redacts rows another stage drops)
        if args.redact_pii:
            from dedup.quality import redact_pii

            red = redact_pii(kept.select("doc_id", "text"), "doc_id", "text")
            kept = kept.drop("text").join(
                red.withColumnRenamed("redacted", "text"), "doc_id"
            )

        kept.write.mode("overwrite").parquet(args.output)
        stage_counts = [v for k, v in metrics.items() if k.startswith("after_")]
        metrics["rows_out"] = stage_counts[-1] if stage_counts else metrics["rows_in"]
        metrics["wall_sec"] = round(time.time() - t0, 2)
        metrics["output"] = args.output
        print(json.dumps(metrics))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
