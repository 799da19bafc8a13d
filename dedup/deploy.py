"""Ship the `dedup` package to Spark Python workers.

Production launch is `spark-submit --py-files dist.zip` (SURVEY.md §3.4); when
the engine is driven from an existing SparkSession (driver contract, tests,
notebooks) we replicate that with `sc.addPyFile` on a zip built from the
installed package — otherwise executors' Python workers raise
ModuleNotFoundError when unpickling the pandas UDFs."""

from __future__ import annotations

import os
import tempfile
import weakref
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()
# sessions whose SQLConf carries the optimizer-rule exclusion: keyed on the
# SESSION object (a newSession() shares the applicationId but has its own
# SQLConf, so the appId memo alone would silently skip the repair there)
_CONF_APPLIED: "weakref.WeakSet" = weakref.WeakSet()


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
    if spark not in _CONF_APPLIED:
        # externally-owned sessions (driver contract, notebooks) don't go
        # through session.get_spark: apply the explode-double-eval exclusion
        # (see session.py) at runtime, preserving any rules already
        # excluded. Memoized per SESSION object (not per application — a
        # newSession() has its own SQLConf); the steady-state cost is a
        # WeakSet lookup, no JVM round-trip.
        excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "") or ""
        if _GENERATE_RULE not in excluded:
            spark.conf.set(
                "spark.sql.optimizer.excludedRules",
                f"{excluded},{_GENERATE_RULE}" if excluded else _GENERATE_RULE,
            )
        _CONF_APPLIED.add(spark)
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip())
    _SHIPPED.add(key)
