"""Text-quality filters for training-data curation (SURVEY.md §2 graft
additions): repetition statistics per document, per the Gopher/MassiveText
quality rules (Rae et al. 2021, table A1 — duplicate-word and duplicate
n-gram fractions are the strongest single low-quality signals: boilerplate,
keyword stuffing, template spam).

Every statistic is a PER-ROW Catalyst expression — size(array_distinct(...))
over the token array and over the n-gram array built by
verify.ngram_set_expr — so the whole operator is one scan inside whole-stage
codegen: zero shuffles, zero UDFs, trivially partition-parallel at any
corpus size. The q56 oracle twin pins the semantics value-for-value."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    ngram_n: int = 5, max_dup_word_frac: float = 0.5,
    max_dup_ngram_frac: float = 0.05,
) -> DataFrame:
    """(id_col, dup_word_frac, dup_{n}gram_frac, keep) per non-NULL-text row.

    dup_word_frac: 1 - distinct/total over lowercased whitespace tokens.
    dup_ngram_frac: the same over word n-grams; rows with under n tokens
    have no n-grams and define it 0.0 (nothing repeats).
    keep = 1 iff both fractions are within their bounds.

    Staged projections deliberately materialize the token and n-gram arrays
    as intermediate columns: CollapseProject re-inlines a cheap alias into
    every use site, and a single flat select measured 5 inlined copies of
    the n-gram transform lambda (PLANS.md, round-4 late additions) —
    plan-pinned to one evaluation in tests/test_plans.py."""
    from .verify import ngram_set_expr

    gcol = f"dup_{ngram_n}gram_frac"
    toks = df.where(F.col(text_col).isNotNull()).select(
        id_col, F.split(F.lower(F.col(text_col)), " ").alias("t")
    )
    arrs = toks.select(
        id_col,
        (1.0 - F.size(F.array_distinct("t")).cast("double") / F.size("t")).alias("dw"),
        F.expr(ngram_set_expr("t", ngram_n)).alias("g"),
    )
    fracs = arrs.select(
        id_col,
        "dw",
        F.when(
            F.size("g") > 0,
            1.0 - F.size(F.array_distinct("g")).cast("double") / F.size("g"),
        ).otherwise(F.lit(0.0)).alias("dg"),
    )
    return fracs.select(
        id_col,
        F.round("dw", 4).alias("dup_word_frac"),
        F.round("dg", 4).alias(gcol),
        F.when(
            (F.col("dw") <= max_dup_word_frac) & (F.col("dg") <= max_dup_ngram_frac), 1
        ).otherwise(0).alias("keep"),
    )


# conservative, engine-portable PII patterns (no backreferences/lookarounds:
# identical semantics under Java regex — Spark — and RE2 — DuckDB; verified
# value-for-value by the q58 oracle twin, which renders its SQL from these
# SAME constants so the two sides cannot drift)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """PII redaction — the C4/RefinedWeb curation step: replace emails and
    phone numbers with typed placeholder tokens, and count what was
    redacted (the counts feed quality dashboards and drop-thresholds —
    a doc that is mostly PII is usually a directory page, not prose).

    Per-row Catalyst regex expressions (whole-stage codegen): one scan,
    zero shuffles, zero UDFs — the same scale shape as repetition_stats.
    Returns (id_col, redacted, n_emails, n_phones) for non-NULL-text rows.

    Counts are PLACEHOLDER counts, not raw-text match counts: redaction is
    sequential (emails first), so phones are counted on the email-redacted
    intermediate — a phone-shaped local part consumed by the email
    replacement ('555-123-4567@example.com') contributes to n_emails only,
    and n_phones always equals the number of <PHONE> tokens emitted."""
    t = F.col(text_col)
    emailless = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return df.where(t.isNotNull()).select(
        id_col,
        F.regexp_replace(emailless, PHONE_RE, "<PHONE>").alias("redacted"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(emailless, F.lit(PHONE_RE), 0)).cast("int").alias("n_phones"),
    )
