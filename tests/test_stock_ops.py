"""Evidence for the stock-Spark operator claims (SURVEY.md §2 S5/S9, R1/R3/R5)
plus the batch-ANN recall gate.

The reference exercises these through pandas (CSV error exports
/root/reference/eridu/etl/checks_evaluation.py:311-334, cluster-results CSV
scan /root/reference/eridu/etl/analyze.py:105, seeded samples
/root/reference/tests/test_cluster_pairs.py:30-33, stratified split
/root/reference/eridu/etl/cluster_split.py:294-313); here each is driven
through the Spark API it maps to."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_sink_and_scan_roundtrip(spark, tmp_path):
    """S9 CSV sink + S5 CSV scan: write a typed error-export table, read it
    back with header+schema, values survive exactly."""
    src = spark.createDataFrame(
        [("a b", "ab", "Spacing Difference", 0.91, True),
         ("x, inc", "x ltd", "Company Type Mismatch", 0.35, False)],
        "name_a string, name_b string, error_category string, score double, label boolean",
    )
    out = str(tmp_path / "errors_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("name_a string, name_b string, error_category string, score double, label boolean")
        .csv(out)
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # inferSchema path (the reference's pd.read_csv shape)
    inferred = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert dict(inferred.dtypes)["score"] == "double"
    assert inferred.count() == 2


def test_seeded_fraction_sample_deterministic(spark):
    """R1/R3 df.sample: same seed + same partitioning -> the identical row
    set; different seed -> (almost surely) different set.

    Gotcha pinned by this test: the seed must go through the EXPLICIT
    3-arg form sample(withReplacement, fraction, seed) — in PySpark 4.1 the
    sample(fraction, seed=...) overload does not produce repeatable output
    across calls."""
    df = spark.range(0, 10_000, 1, 8)
    a = sorted(r[0] for r in df.sample(False, 0.1, 42).collect())
    b = sorted(r[0] for r in df.sample(False, 0.1, 42).collect())
    c = sorted(r[0] for r in df.sample(False, 0.1, 7).collect())
    assert a == b
    assert a != c
    assert 700 <= len(a) <= 1300  # Bernoulli sampling around the fraction


def test_stratified_sample_by(spark):
    """R5 sampleBy: per-stratum fractions honored (reference
    cluster_split.py:294-313 stratified split role)."""
    df = spark.range(0, 9_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    frac = {"0": 0.5, "1": 0.1, "2": 0.0}
    got = df.sampleBy("lang", frac, seed=42).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert 1200 <= counts.get("0", 0) <= 1800  # ~1500
    assert 150 <= counts.get("1", 0) <= 450    # ~300
    assert counts.get("2", 0) == 0
    # determinism under a fixed seed + partitioning
    again = {
        r["lang"]: r["count"]
        for r in df.sampleBy("lang", frac, seed=42).groupBy("lang").count().collect()
    }
    assert counts == again


def test_batch_topk_matches_brute_force(spark):
    """ann.batch_topk is exactly the per-probe brute-force ranking."""
    from dedup.ann import batch_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qe")
    )
    got = batch_topk(e, probes, k=5).collect()
    assert len(got) == 15  # 3 probes x k
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], []).append((r["rn"], r["vec_id"], r["cosine"]))
    import numpy as np

    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in e.collect()}
    for pid, rows in by_probe.items():
        q = vecs[pid]
        sims = sorted(
            (
                (-float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), vid)
                for vid, v in vecs.items()
                if vid != pid
            ),
        )[:5]
        want = [vid for _, vid in sims]
        assert [vid for _, vid, _ in sorted(rows)] == want


def test_batch_topk_quadratic_guard_routes(spark, capsys):
    """A probe table big enough to trip max_pairs auto-routes to the
    bucket-pruned LSH path (logged) instead of running the exact cross
    join; max_pairs=None forces the exact baseline."""
    from dedup.ann import batch_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qe")
    )
    routed = batch_topk(e, probes, k=5, max_pairs=100)
    assert "routing to batch_topk_lsh" in capsys.readouterr().out
    rows = routed.collect()
    # approximate path: per-probe row count is <= k, never more
    per = {}
    for r in rows:
        per[r["probe_id"]] = per.get(r["probe_id"], 0) + 1
    assert per and all(n <= 5 for n in per.values())
    assert set(routed.columns) == {"probe_id", "vec_id", "rn", "cosine"}
    # escape hatch: max_pairs=None always runs exact
    exact = batch_topk(e, probes, k=5, max_pairs=None)
    assert exact.count() == 10 * 5


def test_batch_topk_lsh_recall(spark):
    """Bucket-pruned batch ANN: recall of the exact top-5 neighbour set is
    gated >= 0.9 at (bits=4, tables=32) on the test embeddings (measured
    0.98; these vectors are near-orthogonal so top-k needs generous
    buckets) — the recall/latency dial is (bits, tables); exactness is
    batch_topk's job."""
    from dedup.ann import batch_topk, batch_topk_lsh

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(e.select("embedding").first()[0])
    probes = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qe")
    )
    exact = {
        (r["probe_id"], r["vec_id"]) for r in batch_topk(e, probes, k=5).collect()
    }
    approx = {
        (r["probe_id"], r["vec_id"])
        for r in batch_topk_lsh(e, probes, dim=dim, k=5, bits=4, tables=32).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
