"""Golden tests for abbreviation/initials variants and error categorization.

The acronym cases are the reference's own golden fixtures
(/root/reference/tests/etl/test_acronyms.py:22-86) — exact expected outputs
including the empty/None edges; the categorization cases are hand-built pairs
covering every category the reference report names
(/root/reference/eridu/etl/error_category_analysis.py:95-106)."""

from __future__ import annotations

import pytest

from dedup import signatures
from dedup.evaluation import categorize_errors, error_category_expr


def test_corporate_ending_golden():
    assert signatures.corporate_ending("Apple Inc.") == "Inc."
    assert signatures.corporate_ending("Microsoft Corporation") == "Corporation"
    assert signatures.corporate_ending("Google LLC") == "LLC"
    assert signatures.corporate_ending("IBM") == ""
    assert signatures.corporate_ending("") == ""
    assert signatures.corporate_ending(None) == ""


@pytest.mark.parametrize(
    "name,expected",
    [
        (
            "International Business Machines Corporation",
            [
                {"original": "International Business Machines Corporation", "abbreviated": "IBM"},
                {
                    "original": "International Business Machines Corporation",
                    "abbreviated": "IBM Corporation",
                },
                {
                    "original": "International Business Machines Corporation",
                    "abbreviated": "I.B.M.",
                },
                {
                    "original": "International Business Machines Corporation",
                    "abbreviated": "I.B.M. Corporation",
                },
            ],
        ),
        ("Apple Inc.", []),  # single-word basename -> no abbreviation
        (
            "Johnson & Johnson Inc.",
            [
                {"original": "Johnson & Johnson Inc.", "abbreviated": "JJ"},
                {"original": "Johnson & Johnson Inc.", "abbreviated": "JJ Inc."},
                {"original": "Johnson & Johnson Inc.", "abbreviated": "J.J."},
                {"original": "Johnson & Johnson Inc.", "abbreviated": "J.J. Inc."},
            ],
        ),
    ],
)
def test_acronym_pairs_golden(name, expected):
    result = signatures.acronym_pairs(name)
    assert isinstance(result, list)
    assert all({"original", "abbreviated"} <= set(p) for p in result)
    for e in expected:
        assert e in result
    if not expected:
        assert result == []


def test_acronym_pairs_empty_edges():
    assert signatures.acronym_pairs(None) == []
    assert signatures.acronym_pairs("") == []
    assert signatures.acronym_pairs("ABC") == []  # no suffix stripped


def test_initials_of():
    assert signatures.initials_of("international business machines") == "IBM"
    assert signatures.initials_of("the quick brown fox") == "QBF"  # stopword dropped
    assert signatures.initials_of("single") is None
    assert signatures.initials_of("a b c") is None  # all 1-char tokens filtered
    assert signatures.initials_of("") is None


def test_caption_variants_gains_initials_kind():
    kinds = {v["kind"]: v["variant"] for v in signatures.caption_variants("Big Data Table")}
    assert kinds["initials"] == "BDT"
    assert kinds["lower"] == "big data table"
    # fewer than 2 meaningful words -> no initials row, other kinds intact
    kinds1 = {v["kind"] for v in signatures.caption_variants("single")}
    assert "initials" not in kinds1 and {"lower", "alnum", "sorted"} <= kinds1


CATEGORY_CASES = [
    ("acme data systems", "acmedatasystems", "Spacing Difference"),
    ("international business machines", "I.B.M.", "Initial vs Full Name"),
    ("IBM", "international business machines", "Initial vs Full Name"),
    ("acme widgets inc", "acme widgets ltd", "Company Type Mismatch"),
    ("dr john smith", "john smith", "Title/Prefix Variation"),
    ("john smith junior", "john smith", "Subset/Superset"),
    ("alpha beta", "gamma delta", "Other"),
]


@pytest.mark.parametrize("a,b,expected", CATEGORY_CASES)
def test_categorize_errors_spark(spark, a, b, expected):
    df = spark.createDataFrame([(a, b)], "name_a string, name_b string")
    row = categorize_errors(df).collect()[0]
    assert row["error_category"] == expected


def test_category_expr_dialects_agree(spark):
    """The Spark and DuckDB renderings of the category CASE agree on every
    golden pair — the no-drift property q40 relies on."""
    import duckdb

    con = duckdb.connect()
    for a, b, expected in CATEGORY_CASES:
        sql = error_category_expr("name_a", "name_b", "duck")
        got = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS name_a, ? AS name_b)", [a, b]
        ).fetchone()[0]
        assert got == expected, (a, b, got)
