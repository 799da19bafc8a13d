"""dedup — a from-scratch PySpark-native near-duplicate detection + clustering engine.

Semantics contract: Graphlet-AI/eridu (reference at /root/reference, survey in
SURVEY.md). Execution model: idiomatic Spark DataFrame/SQL + vectorized
pandas/Arrow UDFs, zero per-row Python. See SURVEY.md §7 for the build plan.
"""

__version__ = "0.1.0"
