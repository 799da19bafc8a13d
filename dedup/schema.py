"""Explicit StructTypes for every table the engine reads or writes.

The reference infers schemas on read (SURVEY.md §1.3); we declare them —
required for the binary `bytes` column and for stable driver-contract hashes.
Shapes: images per BASELINE.json:input_hint; pairs/assignments per
FIXTURES.md F2/F3 (roles of the reference's pairs table
/root/reference/eridu/etl/disco.py:162-177 and cluster_results
/root/reference/eridu/etl/analyze.py:53-67)."""

from __future__ import annotations

from pyspark.sql import types as T

IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

PAIRS = T.StructType(
    [
        T.StructField("id_a", T.StringType(), False),
        T.StructField("id_b", T.StringType(), False),
        T.StructField("match_type", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

ASSIGNMENTS = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

CLUSTER_METRICS = T.StructType(
    [
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("avg_score", T.DoubleType(), True),
        T.StructField("min_score", T.DoubleType(), True),
        T.StructField("n_exact", T.LongType(), False),
        T.StructField("n_minhash", T.LongType(), False),
        T.StructField("n_simhash", T.LongType(), False),
        T.StructField("n_substring", T.LongType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("band_lo", T.IntegerType(), True),
        T.StructField("band_hi", T.IntegerType(), True),
        T.StructField("partition_count", T.IntegerType(), True),
        T.StructField("row_count", T.LongType(), True),
        T.StructField("config_hash", T.StringType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)
