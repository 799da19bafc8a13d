"""Cluster-atomic dataset splitting + leak audits.

Reference semantics: every cluster lands wholly in one split
(/root/reference/eridu/etl/cluster_split.py:171-331, C7) and audits verify no
cluster/source straddles splits (/root/reference/eridu/etl/cluster_split.py:334-403
and /root/reference/eridu/train/fine_tune_sbert.py:234-253, C8). The reference
shuffles cluster ids driver-side; we assign split = weighted bucket of a
content hash of the cluster id — deterministic, leak-free by construction, no
driver-side state, identical at any parallelism. md5 (not xxhash64) so the
DuckDB oracle can reproduce it bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(col, buckets: int):
    """Deterministic engine-portable bucket in [0, buckets): first 4 hex chars
    of md5 -> int. 16^4 = 65536 >> any realistic split granularity."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("int") % buckets
    )


def assign_splits(
    assignments: DataFrame,
    weights: dict[str, float] | None = None,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Add a `split` column; all rows of a cluster get the same split.

    weights: split name -> fraction (default train/eval/test 0.8/0.1/0.1,
    the reference's GroupShuffleSplit ratios,
    /root/reference/eridu/train/fine_tune_sbert.py:216-227)."""
    weights = weights or {"train": 0.8, "eval": 0.1, "test": 0.1}
    total = sum(weights.values())
    buckets = 1000
    expr = None
    acc = 0.0
    b = _bucket(F.col(cluster_col), buckets)
    for name, wgt in weights.items():
        acc += wgt / total * buckets
        cond = b < F.lit(int(round(acc)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return assignments.withColumn("split", expr.otherwise(list(weights)[-1]))


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, fractions: dict[str, float]
) -> DataFrame:
    """R5 stratified sample with ENGINE-PORTABLE determinism (reference
    cluster_split.py:294-313 / sklearn stratified split role): keep a row iff
    its md5 key-bucket falls below its stratum's fraction. Unlike
    df.sampleBy (partitioning-dependent RNG), the kept set is a pure function
    of (key, stratum, fractions) — identical across engines, parallelism
    levels and reruns, so the DuckDB oracle reproduces it bit-for-bit.
    Strata missing from `fractions` are dropped (fraction 0)."""
    buckets = 1000
    b = _bucket(F.col(key_col), buckets)
    expr = None
    for stratum, frac in fractions.items():
        cond = (F.col(stratum_col) == stratum) & (b < F.lit(int(round(frac * buckets))))
        expr = cond if expr is None else expr | cond
    return df.where(expr if expr is not None else F.lit(False))


def leak_audit(split_df: DataFrame, group_col: str = "cluster_id") -> DataFrame:
    """Groups spanning >1 split — MUST be empty (reference C8 audit)."""
    return (
        split_df.groupBy(group_col)
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
    )


def select_exemplars(
    members: DataFrame, cluster_col: str = "cluster_id",
    id_col: str = "image_id", quality_col: str = "quality",
) -> DataFrame:
    """One exemplar per cluster by QUALITY: the member with the highest
    numeric quality, ties broken to the lowest id (deterministic). The
    training-data step after dedup — the reference keeps the first
    occurrence per duplicate group (filter.py:51-57 `dropDuplicates`);
    at scale the kept row should be the best one (longest caption,
    highest resolution, best decode score), not the arrival-order one.

    Shape: a single groupBy with min(struct(-quality, id)) — argmax by
    quality with a min-id tie-break in ONE partial-aggregating exchange.
    No window: Window.partitionBy(cluster) materializes each cluster in
    one task, and dedup clusters are exactly where viral families live
    (the r03 reps-stage straggler, measured in bench/reps_skew.py).
    NULL-quality members are ignored — struct ordering sorts a NULL field
    SMALLEST, so an unfiltered NULL would win the negated argmax and a
    broken row (failed decode score, missing caption length) would be
    promoted to exemplar; a cluster whose every member has NULL quality is
    dropped. Returns (cluster_col, exemplar_id, quality_col)."""
    nq = (-F.col(quality_col)).alias("nq")
    return (
        members.where(F.col(quality_col).isNotNull())
        .groupBy(cluster_col)
        .agg(F.min(F.struct(nq, F.col(id_col).alias("eid"))).alias("b"))
        .select(
            cluster_col,
            F.col("b.eid").alias("exemplar_id"),
            (-F.col("b.nq")).alias(quality_col),
        )
    )
