"""Skew hardening: viral hot buckets collapse before LSH; bucket accounting
and the (opt-in) hard cap behave as documented."""

from __future__ import annotations

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from dedup import lsh
from dedup.config import DEFAULT
from dedup.deploy import ensure_shipped


@pytest.fixture(scope="module")
def near_dup_captions(spark):
    """200 captions that are all near-duplicates of one template (a residual
    near-dup hot bucket that exact-collapse CANNOT remove)."""
    base = "the glass bridge reflects a crowded plaza after the rain in pale light near the border"
    rows = [(f"r{i:04d}", base + f" v{i % 7}") for i in range(200)]
    return spark.createDataFrame(rows, "rep_id string, caption string")


def test_skew_stats_expose_hot_buckets(spark, near_dup_captions):
    ensure_shipped(spark)
    sigs = lsh.with_minhash(near_dup_captions, "caption")
    _, skew, _ = lsh.minhash_candidates(sigs, "rep_id")
    s = skew.collect()[0]
    assert s["max_bucket"] >= 20  # the hot bucket is visible in lineage stats
    assert s["n_over_cap"] == 0  # default cap is high


def test_hard_cap_drops_only_oversized_buckets(spark, near_dup_captions):
    ensure_shipped(spark)
    cfg = replace(DEFAULT, bucket_cap=10, hard_cap=True)
    sigs = lsh.with_minhash(near_dup_captions, "caption", cfg)
    pairs_capped, skew, _ = lsh.minhash_candidates(sigs, "rep_id", cfg)
    s = skew.collect()[0]
    assert s["n_over_cap"] > 0  # the drop is accounted, never silent
    n_capped = pairs_capped.count()
    pairs_free, _, _ = lsh.minhash_candidates(sigs, "rep_id", DEFAULT)
    assert n_capped < pairs_free.count()  # cap actually bounded the blowup


def test_viral_exact_dup_never_reaches_lsh(spark):
    """Identical captions collapse to one rep before banding, so the LSH
    join volume is per-UNIQUE-caption — the viral family contributes 1 node."""
    rows = [(f"v{i:04d}", "one caption to rule them all and in the darkness bind them")
            for i in range(500)]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    uniq = df.groupBy("caption").agg(F.min("image_id").alias("rep_id"))
    assert uniq.count() == 1
    sigs = lsh.with_minhash(uniq.select("rep_id", F.lit("x").alias("caption")), "caption")
    pairs, _, _ = lsh.minhash_candidates(sigs, "rep_id")
    assert pairs.count() == 0


def test_phash_hard_cap_and_bucket_stats(spark):
    """The image path honors cfg.hard_cap with the same accounted-never-
    silent contract as the minhash path: a hot chunk-pair bucket (biased
    pHashes sharing two chunks) is visible in phash_bucket_stats, a hard cap
    prunes it (capped output is a strict subset of the uncapped output), and
    the discarded candidate volume is priced in capped_candidate_pairs."""
    # 60 pHashes sharing chunks 0 and 1 (one hot (0,1)-bucket), far apart in
    # the upper bits so none are true Hamming<=6 pairs; plus 2 true near-dups
    hot = [("h%02d" % i, (i * 0x0101010101 << 24) | 0x4242) for i in range(60)]
    near = [("n0", 1 << 50), ("n1", (1 << 50) | 3)]  # hd=2: a true pair
    df = spark.createDataFrame(hot + near, "rep_id string, phash long")

    stats = lsh.phash_bucket_stats(df).collect()[0]
    assert stats["max_bucket"] >= 60
    capcfg = replace(DEFAULT, bucket_cap=10, hard_cap=True)
    cstats = lsh.phash_bucket_stats(df, cfg=capcfg).collect()[0]
    assert cstats["n_over_cap"] >= 1
    assert cstats["capped_candidate_pairs"] >= 60 * 59 // 2

    free = {(r["id_a"], r["id_b"]) for r in lsh.phash_candidates(df).collect()}
    capped = {(r["id_a"], r["id_b"]) for r in lsh.phash_candidates(df, cfg=capcfg).collect()}
    assert ("n0", "n1") in free and ("n0", "n1") in capped
    assert capped <= free


def test_hard_cap_returns_the_persisted_handle(spark, near_dup_captions):
    """With hard_cap=True the returned handle must be the PERSISTED banded
    frame, not the bucket-filtered child — unpersisting a derived DataFrame
    is a no-op and would pin the exploded-band cache for the whole app."""
    ensure_shipped(spark)
    cfg = replace(DEFAULT, bucket_cap=10, hard_cap=True)
    sigs = lsh.with_minhash(lsh.with_shingles(near_dup_captions, "caption", cfg), "caption", cfg)
    for fn in (lsh.minhash_candidates, lsh.minhash_scored_band):
        pairs, _, handle = fn(sigs, "rep_id", cfg)
        pairs.count()  # materialize the cache
        assert handle.is_cached
        n_before = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert n_before >= 1
        handle.unpersist(blocking=True)
        assert not handle.is_cached
        assert spark.sparkContext._jsc.getPersistentRDDs().size() == n_before - 1
