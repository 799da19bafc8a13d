"""Round-3 evaluation operators: AUC-ROC (hand-computed rank-sum cases),
the per-row eval-results table (reference test_results.parquet shape), the
per-member outlier/probability analogs, and the per-category error export."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dedup.evaluation import auc_roc, eval_results


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "score double, label boolean")
    return auc_roc(df).collect()[0]


def test_auc_perfect_separation(spark):
    r = _auc(spark, [(0.9, True), (0.8, True), (0.2, False), (0.1, False)])
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_inverted(spark):
    r = _auc(spark, [(0.1, True), (0.2, True), (0.8, False), (0.9, False)])
    assert r["auc"] == 0.0


def test_auc_all_tied_is_half(spark):
    r = _auc(spark, [(0.5, True), (0.5, False), (0.5, True), (0.5, False)])
    assert r["auc"] == 0.5


def test_auc_hand_computed_mixed(spark):
    # ranks: 0.1(neg) 0.35(pos) 0.4(neg) 0.8(pos) -> U = 1 + 2 = 3 of 4
    r = _auc(spark, [(0.1, False), (0.4, False), (0.35, True), (0.8, True)])
    assert r["auc"] == 0.75


def test_auc_hand_computed_with_ties(spark):
    # pos@0.5 beats neg@0.2 (1), ties neg@0.5 (0.5); pos@0.9 beats both (2)
    # -> (1 + 0.5 + 2) / 4 = 0.875
    r = _auc(spark, [(0.2, False), (0.5, True), (0.5, False), (0.9, True)])
    assert r["auc"] == 0.875


def test_auc_single_class_is_null(spark):
    r = _auc(spark, [(0.2, True), (0.5, True)])
    assert r["auc"] is None


def test_auc_no_window_over_raw_rows(spark):
    """Scale shape: the running-total window must run AFTER the score
    groupBy (over distinct scores), never over the raw row stream."""
    df = spark.createDataFrame([(0.5, True)] * 10, "score double, label boolean")
    plan = auc_roc(df)._jdf.queryExecution().optimizedPlan().toString()
    # Window's child subtree must contain the Aggregate, i.e. Aggregate
    # appears below Window in the plan text order Window...Aggregate
    assert plan.index("Window") < plan.index("Aggregate", plan.index("Window"))


def test_eval_results_table_roundtrip(spark, tmp_path):
    """Shape + semantics of the reference's test_results.parquet
    (fine_tune_sbert.py:596-633): predicted = similarity >= best(F1)
    threshold; correct = predicted == label; parquet roundtrip preserves
    the table exactly."""
    rows = [
        ("a1", "b1", 0.9, True),
        ("a2", "b2", 0.8, True),
        ("a3", "b3", 0.3, False),
        ("a4", "b4", 0.6, False),
        ("a5", "b5", 0.7, True),
    ]
    scored = spark.createDataFrame(rows, "id_a string, id_b string, score double, label boolean")
    out = eval_results(scored)
    assert out.columns == [
        "id_a", "id_b", "similarity", "true_label",
        "best_threshold", "predicted_match", "correct_prediction",
    ]
    got = {r["id_a"]: r for r in out.collect()}
    # F1 hits 1.0 first at threshold 0.61 (>= excludes the 0.6 negative);
    # argmax ties break toward the SMALLEST threshold
    assert all(r["best_threshold"] == 0.61 for r in got.values())
    assert got["a4"]["predicted_match"] is False and got["a4"]["correct_prediction"] is True
    assert got["a5"]["predicted_match"] is True and got["a5"]["correct_prediction"] is True
    p = str(tmp_path / "test_results.parquet")
    out.write.parquet(p)
    back = spark.read.parquet(p)
    assert back.schema == out.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, out.collect()))


def test_member_scores_semantics(spark):
    from dedup.pipeline import member_scores

    asg = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("z", "z")],
        "image_id string, cluster_id string",
    )
    # a-b tight (d=0.1), a-c loose (d=0.5), b-c loose (d=0.5); z singleton
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("a", "c", 0.5), ("b", "c", 0.5)],
        "id_a string, id_b string, score double",
    )
    got = {r["image_id"]: r for r in member_scores(asg, pairs).collect()}
    assert got["c"]["outlier_score"] == 0.5  # (0.5 + 0.5) / 2
    assert got["a"]["outlier_score"] == 0.3  # (0.1 + 0.5) / 2
    assert got["c"]["cluster_probability"] == 0.0  # the cluster-max member
    assert got["z"]["outlier_score"] == 0.0 and got["z"]["cluster_probability"] == 1.0
    assert got["a"]["cluster_probability"] == 0.4  # 1 - 0.3/0.5


def test_member_scores_count_each_pair_once(spark):
    """A pair rediscovered by several tiers (one row per match_type in the
    pairs table) must contribute ONCE, at its best evidence — not once per
    tier. Here a-b is both an exact dup (score 1.0, three reps rows) and a
    minhash pair (0.8): the mean distance for a must weight the a-b pair as
    d=0, giving outlier_score (0 + 0.2) / 2 = 0.1, not a rediscovery-
    weighted blend."""
    from dedup.pipeline import member_scores

    asg = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a")], "image_id string, cluster_id string"
    )
    pairs = spark.createDataFrame(
        [
            ("a", "b", "exact", 1.0),
            ("a", "b", "minhash", 0.8),
            ("a", "b", "simhash", 1.0),
            ("a", "c", "minhash", 0.8),
        ],
        "id_a string, id_b string, match_type string, score double",
    )
    got = {r["image_id"]: r for r in member_scores(asg, pairs).collect()}
    assert got["a"]["outlier_score"] == 0.1  # (0.0 + 0.2) / 2
    assert got["b"]["outlier_score"] == 0.0  # best evidence for a-b is exact
    assert got["c"]["outlier_score"] == 0.2


def test_member_scores_stage_committed(spark, tmp_path):
    """The pipeline commits the per-member table (cluster_results shape)."""
    import pyarrow.parquet as pq

    from dedup import synth
    from dedup.pipeline import Pipeline

    rows = synth.generate(80, seed=31)
    src = str(tmp_path / "img.parquet")
    pq.write_table(synth.to_arrow(rows), src)
    wh = str(tmp_path / "wh")
    asg = Pipeline(wh).run(spark, spark.read.parquet(src))
    ms = spark.read.parquet(os.path.join(wh, "member_scores"))
    assert ms.columns == ["image_id", "cluster_id", "outlier_score", "cluster_probability"]
    assert ms.count() == asg.count()  # one row per image
    bad = ms.where(
        (F.col("outlier_score") < 0) | (F.col("cluster_probability") < 0)
        | (F.col("cluster_probability") > 1)
    )
    assert bad.count() == 0
    # assignments agree with the member table's cluster ids
    j = asg.join(ms.withColumnRenamed("cluster_id", "c2"), "image_id")
    assert j.where(F.col("cluster_id") != F.col("c2")).count() == 0


def test_export_error_categories(spark, tmp_path):
    """One CSV directory per category; per-category row counts equal the
    rollup's (reference checks_evaluation.py:311-334)."""
    from dedup.evaluation import (
        categorize_errors,
        error_category_rollup,
        export_error_categories,
    )

    errors = spark.createDataFrame(
        [
            ("acme corp", "acmecorp", "False Positive", 0.9),
            ("jane p doe", "janep doe", "False Negative", 0.4),
            ("big blue llc", "big blue inc", "False Positive", 0.8),
            ("dr john smith", "john smith", "False Negative", 0.3),
            ("alpha beta", "beta alpha", "False Positive", 0.6),
        ],
        "name_a string, name_b string, error_type string, score double",
    )
    out_dir = str(tmp_path / "errors_by_category")
    cat = export_error_categories(errors, out_dir)
    rollup = {
        r["error_category"]: r["n"]
        for r in error_category_rollup(cat).groupBy("error_category")
        .agg(F.sum("n").alias("n")).collect()
    }
    from urllib.parse import unquote

    dirs = {
        unquote(d.split("=", 1)[1])
        for d in os.listdir(out_dir)
        if d.startswith("error_category=")
    }
    assert dirs == set(rollup)  # one CSV directory per category
    back = spark.read.option("header", True).csv(out_dir)  # partition col restored
    got = {
        r["error_category"]: r["n"]
        for r in back.groupBy("error_category").agg(F.count("*").alias("n")).collect()
    }
    assert got == rollup
