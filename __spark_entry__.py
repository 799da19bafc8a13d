"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on /root/testdata/sf0.001
queries()      -> name -> callable(spark, sf_dir) -> DataFrame (SURVEY.md §2 ops)
oracle_sql()   -> name -> DuckDB-equivalent ANSI SQL (omitted for the
                  engine-native MinHash/CC/winnowing ops -> rows-only check)

The real registry lives in dedup/queries.py; this file only wires paths so the
driver can import it from any cwd.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from dedup import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary on sf0.001."""
    return _q.REGISTRY["q01_pricing_summary"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
