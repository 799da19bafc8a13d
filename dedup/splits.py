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


def leak_audit(split_df: DataFrame, group_col: str = "cluster_id") -> DataFrame:
    """Groups spanning >1 split — MUST be empty (reference C8 audit)."""
    return (
        split_df.groupBy(group_col)
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
    )
