"""Ship the `dedup` package to Spark Python workers.

Production launch is `spark-submit --py-files dist.zip` (SURVEY.md §3.4); when
the engine is driven from an existing SparkSession (driver contract, tests,
notebooks) we replicate that with `sc.addPyFile` on a zip built from the
installed package — otherwise executors' Python workers raise
ModuleNotFoundError when unpickling the pandas UDFs."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def package_zip() -> str:
    """Build a zip of the dedup package, content-addressed so edited source
    never ships a stale cached zip to the workers."""
    import hashlib

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # already imported FROM an archive (spark-submit --py-files): the
        # enclosing zip IS the package — ship it as-is instead of listing
        # inside it (os.listdir can't enter a zip)
        archive = pkg_dir
        while archive and not os.path.exists(archive):
            archive = os.path.dirname(archive)
        if os.path.isfile(archive) and zipfile.is_zipfile(archive):
            return archive
        raise RuntimeError(f"cannot locate the dedup package archive from {pkg_dir}")
    files = sorted(f for f in os.listdir(pkg_dir) if f.endswith(".py"))
    h = hashlib.sha256()
    for fn in files:
        with open(os.path.join(pkg_dir, fn), "rb") as f:
            h.update(fn.encode())
            h.update(f.read())
    out = os.path.join(tempfile.gettempdir(), f"dedup_pkg_{h.hexdigest()[:12]}.zip")
    if not os.path.exists(out):
        tmp = out + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for fn in files:
                z.write(os.path.join(pkg_dir, fn), arcname=f"dedup/{fn}")
        os.replace(tmp, out)
    return out


_GENERATE_RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        # steady state stays a pure set lookup: ensure_shipped runs at the
        # top of every query builder, and the conf get/set below is a JVM
        # gateway round-trip per call otherwise
        return
    # externally-owned sessions (driver contract, notebooks) don't go
    # through session.get_spark: apply the explode-double-eval exclusion
    # (see session.py) at runtime, preserving any rules already excluded.
    # Memoized per APPLICATION: a later newSession() with its own SQLConf
    # would be missed, but every entry point here shares one session.
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "") or ""
    if _GENERATE_RULE not in excluded:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            f"{excluded},{_GENERATE_RULE}" if excluded else _GENERATE_RULE,
        )
    sc.addPyFile(package_zip())
    _SHIPPED.add(key)
