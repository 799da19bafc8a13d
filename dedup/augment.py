"""Disco-style labeled training-pair augmentation: corporate-ending swaps.

Re-expresses the reference's augmentation generator
(/root/reference/eridu/etl/disco.py:11-177 generate_disco_training_pairs):
take unique company names, strip the corporate ending to a basename, then
synthesize labeled pairs by re-attaching endings — MATCH pairs get two
different endings from the SAME country's term list (same legal entity,
different corporate-form notation), NON-MATCH pairs get endings from the
same country (different entity, same form style) or from two DIFFERENT
countries, 50/50. The reference drives every choice from `random` with a
seed; this engine version replaces the RNG with a per-basename md5-derived
60-bit integer whose bit fields make every choice, so the generator is

  * deterministic and order-independent (same base -> same pair, on any
    partitioning, any executor count, any row order), and
  * ANSI-SQL-expressible (the DuckDB oracle in disco_pairs_oracle_sql
    reproduces it bit-for-bit — the q59 driver gate).

Output schema is the reference's 15-column pairs schema
(/root/reference/eridu/etl/disco.py:162-187) with one honest upgrade: the
reference copies norm/fp/lang/dist_* from a RANDOM template row (admittedly
meaningless placeholder values); here they are computed from the generated
names themselves (norm = lowercased alnum-collapsed name, fp = sorted
distinct tokens of norm a la OpenRefine fingerprint, dist_* = levenshtein),
so the emitted table is self-consistent.

Scale shape: one scan -> per-row whole-stage-codegen expressions -> one
DISTINCT on basename (the only shuffle, map-side partial-agg'd). No UDFs,
no driver collects, no joins; at 10^12 names the distinct is the cost and
it is the minimal one (the reference dedups unique names too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .signatures import CORP_SUFFIXES

# Country -> corporate-ending terms (the role of disco's terms_by_country,
# /root/reference/eridu/etl/disco.py:8,49-53). Static tuple: selection
# arithmetic below indexes it, so ORDER IS PART OF THE CONTRACT. Every list
# needs >= 2 terms (match pairs draw two distinct terms from one list).
AUGMENT_TERMS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("us", ("inc", "llc", "corp", "co")),
    ("uk", ("ltd", "plc", "llp")),
    ("de", ("gmbh", "ag")),
    ("fr", ("sa", "s.a.")),
    ("it", ("srl", "spa")),
    ("nl", ("nv", "bv")),
)
assert all(len(ts) >= 2 for _, ts in AUGMENT_TERMS)

SCORE_MATCH = 0.9       # reference disco.py:124
SCORE_NON_MATCH = 0.3   # reference disco.py:160
MIN_BASE_LEN = 3        # reference disco.py:86 (skip basenames shorter than 3)
# bounded trailing-suffix strip: the vectorized twin of the Python kernel
# signatures.strip_corporate_suffix (which loops unboundedly). Two rounds
# cover every name with <= 2 trailing suffix tokens ("Acme Holdings Co Ltd");
# golden-tested equal to the Python kernel on such names.
STRIP_ROUNDS = 2

_NC = len(AUGMENT_TERMS)


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _suffix_list() -> list[str]:
    return sorted(CORP_SUFFIXES)


# ---------------------------------------------------------------- Spark side


def disco_pairs(names: DataFrame, name_col: str = "name") -> DataFrame:
    """Generate the labeled augmented-pairs table from a names DataFrame.

    Pure Catalyst (zero UDFs): strip -> filter -> DISTINCT base -> md5-field
    arithmetic -> 15-column projection. See module docstring for semantics.
    """
    suf = ", ".join(_sql_str(s) for s in _suffix_list())
    ts_all = ", ".join(
        "array(" + ", ".join(_sql_str(t) for t in terms) + ")"
        for _, terms in AUGMENT_TERMS
    )
    strip = (
        f"IF(size(toks) > 0 AND array_contains(array({suf}), "
        "lower(element_at(toks, -1))), slice(toks, 1, size(toks) - 1), toks)"
    )
    d = names.select(F.col(name_col).alias("name")).where(F.col(name_col).isNotNull())
    d = d.withColumn("toks", F.expr("split(name, ' ')"))
    for _ in range(STRIP_ROUNDS):
        d = d.withColumn("toks", F.expr(strip))
    d = d.withColumn("base", F.expr("array_join(toks, ' ')"))
    # reference disco.py:83-87: skip empty / short / unchanged basenames
    d = d.where(
        f"base <> '' AND length(base) >= {MIN_BASE_LEN} AND base <> name"
    ).select("base").distinct()

    # the seed: 60-bit md5-derived integer per basename (cross-engine
    # recipe proven by q52: conv(md5-hex[1:15], 16, 10) in Spark equals
    # CAST('0x' || substr(md5, 1, 15) AS BIGINT) in DuckDB)
    d = (
        d.withColumn("h", F.expr("CAST(conv(substring(md5(base), 1, 15), 16, 10) AS BIGINT)"))
        .withColumn("is_match", F.expr("(h & 1) = 0"))
        .withColumn("same_country", F.expr("(shiftright(h, 2) & 1) = 0"))
        .withColumn("ts_all", F.expr(f"array({ts_all})"))
        .withColumn("c1", F.expr(f"CAST(shiftright(h, 1) % {_NC} AS INT)"))
        .withColumn("ts1", F.expr("element_at(ts_all, c1 + 1)"))
        .withColumn("n1", F.expr("size(ts1)"))
        .withColumn("i1", F.expr("CAST(shiftright(h, 8) % n1 AS INT)"))
        .withColumn("t1", F.expr("element_at(ts1, i1 + 1)"))
        .withColumn(
            "c2", F.expr(f"CAST((c1 + 1 + shiftright(h, 24) % {_NC - 1}) % {_NC} AS INT)")
        )
        # match / non-match-same-country: second DISTINCT term from the same
        # list via skip-indexing ((h>>16) % (n-1), bumped past i1) — the
        # same-list construction is identical for both labels, exactly as in
        # the reference (disco.py:100-141: only the label and score differ).
        .withColumn(
            "i2",
            F.expr(
                "CAST(shiftright(h, 16) % (n1 - 1) AS INT) "
                "+ IF(CAST(shiftright(h, 16) % (n1 - 1) AS INT) >= i1, 1, 0)"
            ),
        )
        .withColumn(
            "t2",
            F.expr(
                "IF(is_match OR same_country, element_at(ts1, i2 + 1), "
                "element_at(element_at(ts_all, c2 + 1), "
                "CAST(shiftright(h, 16) % size(element_at(ts_all, c2 + 1)) AS INT) + 1))"
            ),
        )
        .withColumn("left_name", F.expr("concat(base, ' ', t1)"))
        .withColumn("right_name", F.expr("concat(base, ' ', t2)"))
    )
    norm = (
        "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' '), ' +', ' '))"
    )
    fp = "array_join(array_sort(array_distinct(split({n}, ' '))), ' ')"
    d = (
        d.withColumn("left_norm", F.expr(norm.format(c="left_name")))
        .withColumn("right_norm", F.expr(norm.format(c="right_name")))
        .withColumn("left_fp", F.expr(fp.format(n="left_norm")))
        .withColumn("right_fp", F.expr(fp.format(n="right_norm")))
    )
    return d.select(
        "left_name",
        "left_norm",
        "left_fp",
        F.lit("en").alias("left_lang"),
        F.lit("ORG").alias("left_category"),
        "right_name",
        "right_norm",
        "right_fp",
        F.lit("en").alias("right_lang"),
        F.lit("ORG").alias("right_category"),
        F.col("is_match").alias("match"),
        F.expr("levenshtein(left_norm, right_norm)").alias("dist_norm"),
        F.expr("levenshtein(left_fp, right_fp)").alias("dist_fp"),
        F.expr(f"IF(is_match, CAST({SCORE_MATCH} AS DOUBLE), "
               f"CAST({SCORE_NON_MATCH} AS DOUBLE))").alias("score"),
        F.expr("concat('disco-', base)").alias("source"),
    )


# --------------------------------------------------------------- DuckDB twin


def disco_pairs_oracle_sql(names_subquery: str) -> str:
    """ANSI/DuckDB SQL that reproduces disco_pairs bit-for-bit over
    `names_subquery` (any SELECT yielding a `name` column). Used as q59's
    driver oracle; also the brute-force documentation of the recipe."""
    suf = "[" + ", ".join(_sql_str(s) for s in _suffix_list()) + "]"
    ts_all = (
        "[" + ", ".join(
            "[" + ", ".join(_sql_str(t) for t in terms) + "]"
            for _, terms in AUGMENT_TERMS
        ) + "]"
    )
    strip = (
        f"CASE WHEN len(toks) > 0 AND list_contains({suf}, lower(toks[-1])) "
        "THEN list_slice(toks, 1, len(toks) - 1) ELSE toks END"
    )
    norm = (
        "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'), "
        "' +', ' ', 'g'))"
    )
    fp = "array_to_string(list_sort(list_distinct(string_split({n}, ' '))), ' ')"
    return f"""
    WITH aug_names AS ({names_subquery}),
    tok0 AS (SELECT name, string_split(name, ' ') AS toks
             FROM aug_names WHERE name IS NOT NULL),
    tok1 AS (SELECT name, {strip} AS toks FROM tok0),
    tok2 AS (SELECT name, {strip} AS toks FROM tok1),
    bases AS (
      SELECT DISTINCT base FROM (
        SELECT name, array_to_string(toks, ' ') AS base FROM tok2) x
      WHERE base <> '' AND length(base) >= {MIN_BASE_LEN} AND base <> name),
    seeded AS (
      SELECT base, CAST(concat('0x', substr(md5(base), 1, 15)) AS BIGINT) AS h
      FROM bases),
    picked AS (
      SELECT base, h,
             (h & 1) = 0 AS is_match,
             ((h >> 2) & 1) = 0 AS same_country,
             CAST((h >> 1) % {_NC} AS INT) AS c1
      FROM seeded),
    terms1 AS (
      SELECT *, ({ts_all})[c1 + 1] AS ts1,
             CAST((c1 + 1 + (h >> 24) % {_NC - 1}) % {_NC} AS INT) AS c2
      FROM picked),
    idx AS (
      SELECT *, len(ts1) AS n1, CAST((h >> 8) % len(ts1) AS INT) AS i1,
             CAST((h >> 16) % (len(ts1) - 1) AS INT) AS i2p
      FROM terms1),
    chosen AS (
      SELECT *, ts1[i1 + 1] AS t1,
             CASE WHEN is_match OR same_country
                  THEN ts1[i2p + CASE WHEN i2p >= i1 THEN 1 ELSE 0 END + 1]
                  ELSE (({ts_all})[c2 + 1])[
                         CAST((h >> 16) % len(({ts_all})[c2 + 1]) AS INT) + 1]
             END AS t2
      FROM idx),
    named AS (
      SELECT base, is_match,
             base || ' ' || t1 AS left_name,
             base || ' ' || t2 AS right_name
      FROM chosen),
    normed AS (
      SELECT *, {norm.format(c='left_name')} AS left_norm,
             {norm.format(c='right_name')} AS right_norm
      FROM named),
    fped AS (
      SELECT *, {fp.format(n='left_norm')} AS left_fp,
             {fp.format(n='right_norm')} AS right_fp
      FROM normed)
    SELECT left_name, left_norm, left_fp,
           'en' AS left_lang, 'ORG' AS left_category,
           right_name, right_norm, right_fp,
           'en' AS right_lang, 'ORG' AS right_category,
           is_match AS match,
           CAST(levenshtein(left_norm, right_norm) AS INT) AS dist_norm,
           CAST(levenshtein(left_fp, right_fp) AS INT) AS dist_fp,
           CASE WHEN is_match THEN CAST({SCORE_MATCH} AS DOUBLE)
                ELSE CAST({SCORE_NON_MATCH} AS DOUBLE) END AS score,
           'disco-' || base AS source
    FROM fped
    """
