"""Golden-case evaluation: accuracy / precision / recall / F1 + confusion
matrix + threshold sweep.

Reference semantics: checks.yml evaluation
(/root/reference/eridu/etl/checks_evaluation.py:71-177 — per-case
predicted-vs-label, metric rollup) and PR-curve threshold selection
(/root/reference/eridu/etl/evaluate.py:158-217,
/root/reference/eridu/train/fine_tune_sbert.py:605-613 — best threshold =
argmax F1). All relational, no UDFs: conditional aggregation (A9) + a
thresholds-DataFrame join (W4 'argmax over a curve' as orderBy+limit)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def confusion_metrics(
    scored: DataFrame, label_col: str = "label", pred_col: str = "predicted_match"
) -> DataFrame:
    """One row: tp/fp/tn/fn + accuracy/precision/recall/f1 (4dp)."""
    lab = F.col(label_col).cast("boolean")
    pred = F.col(pred_col).cast("boolean")
    agg = scored.agg(
        F.sum(F.when(lab & pred, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~lab & pred, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~lab & ~pred, 1).otherwise(0)).alias("tn"),
        F.sum(F.when(lab & ~pred, 1).otherwise(0)).alias("fn"),
    )
    tp, fp, tn, fn = F.col("tp"), F.col("fp"), F.col("tn"), F.col("fn")
    prec = tp / F.greatest(tp + fp, F.lit(1))
    rec = tp / F.greatest(tp + fn, F.lit(1))
    return agg.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.round((tp + tn) / F.greatest(tp + fp + tn + fn, F.lit(1)), 4).alias("accuracy"),
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12)), 4).alias("f1"),
    )


def best_threshold(
    scored: DataFrame, score_col: str = "score", label_col: str = "label", steps: int = 101
) -> DataFrame:
    """Sweep `steps` thresholds in [0,1]; return the argmax-F1 row
    (threshold, f1, precision, recall). Cross join against a generated
    thresholds table — one shuffle-free pass over the scores per Catalyst."""
    spark = scored.sparkSession
    ths = spark.range(steps).select((F.col("id") / (steps - 1)).alias("threshold"))
    lab = F.col(label_col).cast("boolean")
    pred = F.col(score_col) >= F.col("threshold")
    sweep = (
        scored.crossJoin(F.broadcast(ths))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(lab & pred, 1).otherwise(0)).alias("tp"),
            F.sum(F.when(~lab & pred, 1).otherwise(0)).alias("fp"),
            F.sum(F.when(lab & ~pred, 1).otherwise(0)).alias("fn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = tp / F.greatest(tp + fp, F.lit(1))
    rec = tp / F.greatest(tp + fn, F.lit(1))
    return (
        sweep.select(
            F.round("threshold", 4).alias("threshold"),
            F.round(2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12)), 4).alias("f1"),
            F.round(prec, 4).alias("precision"),
            F.round(rec, 4).alias("recall"),
        )
        .orderBy(F.desc("f1"), F.asc("threshold"))
        .limit(1)
    )


def evaluate_checks(
    checks: DataFrame, pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Golden checks (query_id, candidate_id, match:boolean) against the
    engine's verified pairs table: predicted = pair present. Left join +
    confusion rollup (reference checks_evaluation.py:129-177)."""
    norm = pairs.select(
        F.least(id_a, id_b).alias("qa"), F.greatest(id_a, id_b).alias("qb")
    ).distinct().withColumn("predicted_match", F.lit(True))
    joined = (
        checks.select(
            F.least("query_id", "candidate_id").alias("qa"),
            F.greatest("query_id", "candidate_id").alias("qb"),
            F.col("match").alias("label"),
        )
        .join(norm, ["qa", "qb"], "left")
        .na.fill({"predicted_match": False})
    )
    return confusion_metrics(joined)
