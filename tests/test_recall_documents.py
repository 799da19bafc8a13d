"""Oracle-checked recall of the MinHash path on REAL driver testdata
(documents @ sf0.001): brute-force exact-Jaccard pairs vs LSH+verify output.
This is the same gate as the synthetic-images one, on independent data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedup import lsh, verify
from dedup.config import DEFAULT
from dedup.deploy import ensure_shipped
from dedup.signatures import jaccard, shingle_hashes


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("rep_id"), F.col("text").alias("caption"))
        .cache()
    )


def test_minhash_lsh_recall_on_documents(spark, docs):
    ensure_shipped(spark)
    rows = [(r["rep_id"], r["caption"]) for r in docs.collect()]
    # brute-force oracle: exact Jaccard over all pairs (sf0.001 is small)
    sh = {rid: shingle_hashes(t, DEFAULT.shingle_k) for rid, t in rows}
    truth = set()
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if jaccard(sh[ids[i]], sh[ids[j]]) >= DEFAULT.jaccard_threshold:
                truth.add((ids[i], ids[j]))

    sigs = lsh.with_shingles(lsh.with_minhash(docs, "caption"), "caption")
    cand, _, _ = lsh.minhash_candidates(sigs, "rep_id")
    got = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in verify.verify_jaccard(cand, sigs, "rep_id").collect()
    }
    # precision is exact by construction (verify recomputes true Jaccard)
    assert got <= truth or not truth
    if truth:
        assert len(got & truth) / len(truth) >= 0.99
    # candidate stage did not silently do all-pairs (LSH actually pruned)
    n = len(ids)
    assert cand.count() < n * (n - 1) / 2 * 0.5
