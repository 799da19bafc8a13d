"""Iterative connected components: alternating large-star / small-star.

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SoCC'14) — O(log^2 n) rounds, robust to the giant-component skew that plain
label propagation chokes on (SURVEY.md §4.2; cf. BTS, PAPERS.md). Replaces
the reference's single-node HDBSCAN labeling (/root/reference/Clusters.md:29-57)
with the same output contract: every row gets a cluster id; rows with no dup
edge keep cluster_id = own id (noise -> singleton,
/root/reference/Clusters.md:51-55).

Each round is two shuffle stages (groupBy-min + join); the edge set is
`localCheckpoint()`ed every round to truncate lineage (Catalyst has no
fixpoint operator). Convergence = stable (count, xor-of-hashes) checksum,
one cheap aggregate action per round. Node ids are compared as strings; the
component root is the lexicographic min id, which makes assignments
deterministic across parallelism levels (min-id everywhere, no rand)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", F.col("src")).alias("m"))
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    orient = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = orient.groupBy("src").agg(F.min("dst").alias("m"))
    linked = (
        orient.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("src"), F.col("m").alias("dst")))
    )
    return linked.where(F.col("src") != F.col("dst")).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, vertices: DataFrame, max_iter: int = 40
) -> DataFrame:
    """edges(src,dst) + vertices(id) -> assignments(image_id, cluster_id).

    cluster_id = min id of the component; vertices absent from edges map to
    themselves (singletons)."""
    e = (
        edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    prev = _checksum(e)
    for _ in range(max_iter):
        if prev[0] == 0:
            break
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged: e is a star graph node -> component-min root
    roots = e.select(F.col("src").alias("image_id"), F.col("dst").alias("cluster_id"))
    return (
        vertices.select(F.col(vertices.columns[0]).alias("image_id"))
        .join(roots, "image_id", "left")
        .select(
            "image_id",
            F.coalesce("cluster_id", "image_id").alias("cluster_id"),
        )
    )
