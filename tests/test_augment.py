"""Golden + property tests for the disco-style augmentation generator
(dedup/augment.py), mirroring the reference's golden-case style
(/root/reference/tests/etl/test_acronyms.py:33-86)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup.augment import (
    AUGMENT_TERMS,
    SCORE_MATCH,
    SCORE_NON_MATCH,
    disco_pairs,
    disco_pairs_oracle_sql,
)
from dedup.signatures import strip_corporate_suffix

ALL_TERMS = {t for _, ts in AUGMENT_TERMS for t in ts}


def _pairs(spark, names: list[str]):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    return {r["left_name"]: r.asDict() for r in disco_pairs(df).collect()}


def test_strip_matches_python_kernel(spark):
    """The bounded 2-round Catalyst strip equals the (unbounded) Python
    kernel on every name with <= 2 trailing suffix tokens — including
    mixed-case endings, dotted forms, and double endings."""
    names = [
        "International Business Machines Corporation",
        "Acme Holdings Co Ltd",
        "apple inc.",
        "Deutsche Bahn GmbH",
        "Nordic Timber Oy AB",
        "Plain Name Without Ending",
        "Banco Santander S.A.",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = disco_pairs(df)
    # re-derive the basenames the generator used from its source column
    bases = {r["source"][len("disco-"):] for r in got.collect()}
    want = {
        strip_corporate_suffix(n)
        for n in names
        if strip_corporate_suffix(n) not in ("", n)
        and len(strip_corporate_suffix(n)) >= 3
    }
    assert bases == want


def test_golden_pair_shape(spark):
    """Golden structural facts for a known basename: both names extend the
    basename with a vocab term, MATCH pairs use two distinct terms of one
    country list, and score follows the label (reference disco.py:100-160)."""
    got = _pairs(spark, ["International Business Machines Corporation"])
    assert len(got) == 1
    row = next(iter(got.values()))
    base = "International Business Machines"
    assert row["source"] == f"disco-{base}"
    lt = row["left_name"][len(base) + 1 :]
    rt = row["right_name"][len(base) + 1 :]
    assert lt in ALL_TERMS and rt in ALL_TERMS
    assert row["left_name"] != row["right_name"]
    assert row["score"] == (SCORE_MATCH if row["match"] else SCORE_NON_MATCH)
    if row["match"]:
        country = next(c for c, ts in AUGMENT_TERMS if lt in ts)
        assert rt in dict(AUGMENT_TERMS)[country]
    # computed (not template-copied) metadata columns are self-consistent
    assert row["left_norm"] == row["left_norm"].lower().strip()
    assert sorted(set(row["left_fp"].split())) == row["left_fp"].split()
    assert row["left_lang"] == row["right_lang"] == "en"
    assert row["left_category"] == row["right_category"] == "ORG"


def test_skips_reference_edge_cases(spark):
    """reference disco.py:83-87: skip names whose basename is empty, shorter
    than 3 chars, or identical to the original (no ending present)."""
    got = _pairs(spark, ["Inc", "AB ltd", "No Ending Here", "X Y"])
    assert got == {}


def test_deterministic_and_partition_independent(spark):
    names = [f"company number {i} variant inc" for i in range(60)]
    df1 = spark.createDataFrame([(n,) for n in names], "name string")
    df8 = df1.repartition(8)
    a = sorted(map(tuple, disco_pairs(df1).collect()))
    b = sorted(map(tuple, disco_pairs(df8).collect()))
    assert a == b and len(a) == 60


def test_label_mix_and_distinct_names(spark):
    """Across a wide corpus: both labels occur in roughly the reference's
    50/50 mix, left != right always, distances are consistent."""
    names = [f"acme widget factory {i} gmbh" for i in range(200)]
    rows = disco_pairs(
        spark.createDataFrame([(n,) for n in names], "name string")
    ).collect()
    assert len(rows) == 200
    n_match = sum(1 for r in rows if r["match"])
    assert 60 <= n_match <= 140  # md5 bit is fair; bound is generous
    for r in rows:
        assert r["left_name"] != r["right_name"]
        assert r["dist_norm"] >= 1  # endings differ, norms must too
        assert r["score"] == (SCORE_MATCH if r["match"] else SCORE_NON_MATCH)


def test_duckdb_twin_bit_for_bit(spark):
    """The DuckDB oracle reproduces the Spark generator exactly — the same
    check the driver's hash gate performs for q59, run here on a corpus
    with every branch exercised (match, non-match same-country, non-match
    cross-country, double endings, skipped rows)."""
    duckdb = pytest.importorskip("duckdb")
    names = [f"alpha beta {i} ltd" for i in range(40)] + [
        "Acme Holdings Co Ltd",
        "Banco Santander S.A.",
        "Inc",
        "No Ending Here",
    ]
    sdf = spark.createDataFrame([(n,) for n in names], "name string")
    got = sorted(map(tuple, disco_pairs(sdf).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE names AS SELECT * FROM (VALUES "
        + ", ".join("(?)" for _ in names)
        + ") t(name)",
        names,
    )
    want = sorted(map(tuple, con.execute(
        disco_pairs_oracle_sql("SELECT name FROM names")
    ).fetchall()))
    assert got == want and len(got) == 42
