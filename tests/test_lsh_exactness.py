"""Set-exactness gates for the LSH tiers.

- pHash chunk-pair LSH output must EQUAL brute-force all-pairs Hamming<=6
  (the pigeonhole guarantee is exact, not probabilistic).
- Hyperplane-LSH embedding pairs (q33's config) must be a SUBSET of the
  exact brute-force set (in-join verification => exact precision) with
  recall gated at the registered config."""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F

from dedup import lsh


def test_phash_candidates_equal_brute_force(spark):
    rng = np.random.default_rng(5)
    vals = rng.integers(-(2**63), 2**63 - 1, size=300, dtype=np.int64)
    rows = [(f"v{i:04d}", int(v)) for i, v in enumerate(vals)]
    # plant near-dups: flip 0..6 bits of the first 40 values (all must pair),
    # plus 7-bit flips of the next 10 (all must NOT pair with their source)
    for i in range(40):
        v = np.uint64(np.int64(vals[i]))
        for f in rng.choice(64, size=int(rng.integers(0, 7)), replace=False):
            v ^= np.uint64(1) << np.uint64(f)
        rows.append((f"w{i:04d}", int(np.int64(v))))
    for i in range(40, 50):
        v = np.uint64(np.int64(vals[i]))
        for f in rng.choice(64, size=7, replace=False):
            v ^= np.uint64(1) << np.uint64(f)
        rows.append((f"x{i:04d}", int(np.int64(v))))

    df = spark.createDataFrame(rows, "rep_id string, phash long")
    got = {(r["id_a"], r["id_b"], r["hd"]) for r in lsh.phash_candidates(df).collect()}

    def hd(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    want = set()
    for (ia, va), (ib, vb) in itertools.combinations(rows, 2):
        d = hd(va, vb)
        if d <= 6 and ia != ib:
            x, y = sorted((ia, ib))
            want.add((x, y, d))
    assert got == want
    assert len(want) >= 30  # the planted families actually exercise the path
    assert not any(a.startswith("x") or b.startswith("x") for a, b, _ in got
                   if (a.startswith("x") and b.startswith("v")) or (a.startswith("v") and b.startswith("x")))


def test_ann_lsh_subset_and_recall_of_exact(spark):
    """q33's registered config: emitted pairs (restricted to q32's id range)
    are a subset of the exact brute-force cosine>=0.4 set, recall >= 0.9."""
    from dedup.ann import cosine_expr, lsh_near_pairs

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    dim = len(e.select("embedding").first()[0])
    sub = e.where(F.col("vec_id") < 250).select("vec_id", "embedding")
    a, b = sub.alias("a"), sub.alias("b")
    cos = cosine_expr("a.embedding", "b.embedding")
    exact = {
        (r[0], r[1])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= 0.4)
        .select("a.vec_id", "b.vec_id")
        .collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_pairs(e, dim=dim, threshold=0.4, bits="auto", tables=24).collect()
        if r["id_a"] < 250 and r["id_b"] < 250
    }
    assert approx <= exact  # exact precision: cosine verified in-join
    assert len(approx & exact) / len(exact) >= 0.9  # measured 1.0 at this config


def test_auto_bits_bounds_bucket_volume():
    """auto_bits must keep expected rows/bucket <= target at EVERY scale —
    the registered q33 config self-sizes instead of freezing bits=4 (which
    is ~n^2/16 candidates per table at real n)."""
    from dedup.ann import auto_bits

    target = 128
    for n in (1, 100, 500, 2_000, 60_000, 1_000_000, 10**9, 10**12):
        bits = auto_bits(n, target_bucket_rows=target)
        assert 4 <= bits <= 32
        if bits < 32:  # below the cap the bound is exact
            assert n / (1 << bits) <= target, (n, bits)
    # the two driver scale factors resolve to the measured-green config
    assert auto_bits(500) == 4 and auto_bits(2000) == 4
    # and growth is monotonic (no recall cliff from a non-monotone dial)
    vals = [auto_bits(n) for n in (10**3, 10**4, 10**5, 10**6, 10**7)]
    assert vals == sorted(vals)
