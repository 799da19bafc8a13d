"""Property tests for the text-quality kernels (quality.repetition_stats,
verify.ngram_set_expr): the Catalyst expressions must match an independent
pure-Python oracle on randomized + adversarial inputs — the DuckDB twin
(q55/q56) pins them only on the testdata distribution; this pins the edge
cases (empty strings, single tokens, repeated separators, unicode, texts
shorter than n)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _texts():
    rng = random.Random(13)
    vocab = ["data", "spark", "the", "a", "日本", "naïve", "x"]
    texts = ["", "one", "one two", "a  b", " lead", "trail ", "spam " * 30]
    for _ in range(300):
        n = rng.randint(1, 25)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    return texts


def _py_tokens(text: str) -> list[str]:
    # the engine convention: lowercase, split on single spaces (empty tokens
    # from doubled separators are kept — Spark's split(x, ' ') matches
    # Python's str.split(' '), NOT str.split())
    return text.lower().split(" ")


def _py_ngrams(text: str, n: int) -> list[str]:
    t = _py_tokens(text)
    if len(t) < n:
        return []
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


def test_ngram_set_expr_matches_python_oracle(spark):
    from dedup.verify import ngram_set_expr

    texts = _texts()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: r["g"]
        for r in df.select(
            "i", F.split(F.lower("text"), " ").alias("t")
        ).select("i", F.expr(ngram_set_expr("t", 3)).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_ngrams(t, 3), repr(t)


def test_repetition_stats_matches_python_oracle(spark):
    from dedup.quality import repetition_stats

    texts = _texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)] + [(9999, None)],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            df, "doc_id", "text", ngram_n=4,
            max_dup_word_frac=0.4, max_dup_ngram_frac=0.1,
        ).collect()
    }
    assert 9999 not in out  # NULL text rows are excluded, not scored
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        dw = round(1.0 - len(set(toks)) / len(toks), 4)
        grams = _py_ngrams(t, 4)
        dg = round(1.0 - len(set(grams)) / len(grams), 4) if grams else 0.0
        r = out[i]
        assert abs(r["dup_word_frac"] - dw) < 1e-9, repr(t)
        assert abs(r["dup_4gram_frac"] - dg) < 1e-9, repr(t)
        # the keep flag derives from the UNROUNDED fractions; mirror that
        uw = 1.0 - len(set(toks)) / len(toks)
        ug = (1.0 - len(set(grams)) / len(grams)) if grams else 0.0
        assert r["keep"] == int(uw <= 0.4 and ug <= 0.1), repr(t)


def test_redact_pii_semantics(spark):
    from dedup.quality import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and al.ice+x@sub.domain.org end"),
            (2, "call 555-123-4567 or 555-000-1111."),
            (3, "no pii here, 5551234567 is not formatted"),
            (4, None),
            # phone-shaped email local part: the email replacement consumes
            # it, so it must count as ONE email and ZERO phones — counts are
            # placeholder counts (phones counted post-email-redaction)
            (5, "write 555-123-4567@example.com maybe"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert 4 not in got  # NULL text excluded, not scored
    assert got[1]["redacted"] == "mail <EMAIL> and <EMAIL> end"
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (2, 0)
    assert got[2]["redacted"] == "call <PHONE> or <PHONE>."
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (0, 2)
    assert got[3]["redacted"] == "no pii here, 5551234567 is not formatted"
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (0, 0)
    assert got[5]["redacted"] == "write <EMAIL> maybe"
    assert (got[5]["n_emails"], got[5]["n_phones"]) == (1, 0)


def test_redact_pii_plan_single_scan(spark):
    """Same scale contract as repetition_stats: per-row regex expressions —
    one scan, no Exchange, no Python."""
    from dedup.quality import redact_pii

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
