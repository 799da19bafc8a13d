"""Candidate verification: exact Jaccard, exact Hamming, suffix-array substring.

LSH (lsh.py) supplies recall; this module supplies precision by recomputing
the EXACT metric on each candidate pair only. Jaccard and Hamming verify run
entirely JVM-side (`array_intersect`, `bit_count` — whole-stage codegen); the
substring pass is a grouped `applyInPandas` that builds a suffix array per
fingerprint bucket (north_rule "suffix-array substring pass").

Reference semantics: threshold match decision
/root/reference/eridu/train/utils.py:347-356; exact-dup fragments fall under
the exact-dup pass /root/reference/eridu/etl/filter.py:51-57."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .config import DedupConfig, DEFAULT
from . import signatures


def verify_jaccard(
    candidates: DataFrame, shingled: DataFrame, id_col: str = "rep_id", cfg: DedupConfig = DEFAULT
) -> DataFrame:
    """(id_a, id_b) candidates -> verified pairs with exact shingle Jaccard.

    `shingled` carries (id_col, shingles:array<long>). Joins are plain equi
    joins on the id; the Jaccard itself is array_intersect/size — no UDF."""
    sh = shingled.select(F.col(id_col), F.col("shingles"))
    j = (
        candidates.join(sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "score",
            F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
        )
    )
    return (
        j.where(F.col("score") >= F.lit(cfg.jaccard_threshold))
        .select("id_a", "id_b", F.lit("minhash").alias("match_type"), F.col("score").cast("double"))
    )


def verify_hamming(
    candidates: DataFrame, phashes: DataFrame, id_col: str = "rep_id",
    phash_col: str = "phash", cfg: DedupConfig = DEFAULT,
) -> DataFrame:
    """Exact 64-bit Hamming distance on candidate pairs (bit_count(xor))."""
    ph = phashes.select(F.col(id_col), F.col(phash_col))
    j = (
        candidates.join(ph.withColumnsRenamed({id_col: "id_a", phash_col: "ph_a"}), "id_a")
        .join(ph.withColumnsRenamed({id_col: "id_b", phash_col: "ph_b"}), "id_b")
        .withColumn("hd", F.expr("bit_count(ph_a ^ ph_b)"))
    )
    return (
        j.where(F.col("hd") <= F.lit(cfg.hamming_threshold))
        .select(
            "id_a",
            "id_b",
            F.lit("simhash").alias("match_type"),
            (F.lit(1.0) - F.col("hd") / F.lit(64.0)).cast("double").alias("score"),
        )
    )


# ------------------------------------------------ suffix-array substring pass


def _suffix_array(s: str) -> list[int]:
    """Plain O(n log^2 n)-ish suffix array (bucket texts are small)."""
    return sorted(range(len(s)), key=lambda i: s[i:])


def substring_pairs_in_group(ids: list[str], captions: list[str], min_len: int) -> list[tuple[str, str]]:
    """Within one fingerprint bucket: pairs (container, fragment) where the
    FULL caption of the fragment (len >= min_len) occurs contiguously inside
    the container's caption. Uses a suffix array over the concatenated bucket
    text + binary search per needle."""
    texts = [c.lower() for c in captions]
    sep = "\x00"
    big = sep.join(texts)
    offsets = [0]
    for t in texts:
        offsets.append(offsets[-1] + len(t) + 1)
    sa = _suffix_array(big)
    out: set[tuple[str, str]] = set()
    import bisect

    for bi, needle in enumerate(texts):
        if len(needle) < min_len:
            continue
        lo = bisect.bisect_left(sa, needle, key=lambda i: big[i : i + len(needle)])
        hi = bisect.bisect_right(sa, needle, key=lambda i: big[i : i + len(needle)])
        for pos in sa[lo:hi]:
            ai = bisect.bisect_right(offsets, pos) - 1
            if ai == bi:
                continue
            if pos + len(needle) <= offsets[ai + 1] - 1:  # fully inside one caption
                a, b = ids[ai], ids[bi]
                out.add((a, b) if a < b else (b, a))
    return sorted(out)


def substring_edges(
    captions_df: DataFrame, id_col: str = "rep_id", caption_col: str = "caption",
    cfg: DedupConfig = DEFAULT,
) -> DataFrame:
    """Suffix-array substring pass over unique captions.

    1. winnowing fingerprints per caption (Arrow pandas_udf) — guarantee:
       any containment of length >= cfg.substr_min_len shares a fingerprint;
    2. keep only fingerprints seen >= 2x (aggregate prune before the shuffle);
    3. groupBy(fingerprint).applyInPandas: suffix array per bucket -> edges."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _wf(s: pd.Series) -> pd.Series:
        return signatures.batch_winnow(s, cfg)

    fps = (
        captions_df.select(
            F.col(id_col).alias("id"), F.col(caption_col).alias("caption"), _wf(F.col(caption_col)).alias("fps")
        )
        .select("id", "caption", F.explode("fps").alias("fp"))
    )
    hot = fps.groupBy("fp").agg(F.count("*").alias("n")).where(F.col("n") > 1).select("fp")
    fps = fps.join(hot, "fp")  # AQE broadcasts the (small) hot-fp set

    out_schema = T.StructType(
        [T.StructField("id_a", T.StringType()), T.StructField("id_b", T.StringType())]
    )
    min_len = cfg.substr_min_len

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        pairs = substring_pairs_in_group(
            pdf["id"].tolist(), pdf["caption"].tolist(), min_len
        )
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    pairs = fps.groupBy("fp").applyInPandas(emit, out_schema).distinct()
    return pairs.select(
        "id_a", "id_b", F.lit("substring").alias("match_type"), F.lit(1.0).alias("score")
    )
