"""Filesystem shim for the commit layer (warehouse manifests + stream state).

100 TB lives on HDFS / S3 (the reference's own warehouse is plain
``df.write.parquet`` to any Hadoop path — /root/reference/eridu/etl/filter.py:86-88),
but manifest commits need a handful of small-file primitives Spark's writers
don't expose: exists / read / atomic-write / list / delete. This module is
the ONLY place those primitives touch a concrete filesystem:

  - ``LocalFS``  — plain ``os``/``shutil`` for bare paths (the sandbox, CI);
  - ``HadoopFS`` — the live SparkSession's ``org.apache.hadoop.fs.FileSystem``
    for any URI with a scheme (hdfs://, s3a://, file://, ...), so the same
    warehouse code commits, resumes, and streams against an object store.

``get_fs(path)`` picks the impl from the path's scheme. Commit protocol on
both impls: write ``<name>.tmp`` then rename over the destination. On the
local impl the rename (``os.replace``) is atomic. On Hadoop the destination
is deleted first (``FileSystem.rename`` refuses to overwrite); a crash in
the tiny delete->rename window leaves NO manifest, which the resume contract
treats as "stage incomplete -> recompute" — crash-SAFE (idempotent), merely
not crash-optimal, which is the right trade on stores like S3 where no
rename is atomic anyway."""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import urlparse


class LocalFS:
    """Driver-local POSIX paths (no scheme)."""

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def append_text(self, path: str, text: str) -> None:
        with open(path, "a") as f:
            f.write(text)

    def list_files(self, path: str) -> list[str]:
        return sorted(os.listdir(path)) if os.path.isdir(path) else []

    def delete(self, path: str, recursive: bool = False) -> None:
        if recursive:
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)


class HadoopFS:
    """Any Hadoop-resolvable URI (hdfs://, s3a://, file://, ...), served by
    the live SparkSession's JVM FileSystem — the exact client the executors'
    parquet writes go through, so commit visibility matches data visibility."""

    def __init__(self, uri: str):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(f"HadoopFS for {uri!r} needs an active SparkSession")
        self._jvm = spark._jvm
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI(uri), spark._jsc.hadoopConfiguration()
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = self._p(path + ".tmp")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = self._p(path)
        if self._fs.exists(dst):
            self._fs.delete(dst, False)  # rename refuses overwrite; see module doc
        if not self._fs.rename(tmp, dst):
            raise IOError(f"rename {path}.tmp -> {path} failed")

    def append_text(self, path: str, text: str) -> None:
        # append() is disabled on many deployments (and meaningless on S3):
        # read-modify-write through the same atomic commit instead. Lineage
        # files are KBs of JSONL; this stays driver-side and tiny.
        old = self.read_text(path) if self.exists(path) else ""
        self.write_text_atomic(path, old + text)

    def list_files(self, path: str) -> list[str]:
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return sorted(s.getPath().getName() for s in self._fs.listStatus(p))

    def delete(self, path: str, recursive: bool = False) -> None:
        p = self._p(path)
        if self._fs.exists(p):
            self._fs.delete(p, recursive)


def get_fs(path: str):
    """Scheme-sniffed impl: bare paths -> LocalFS, any URI -> HadoopFS."""
    return HadoopFS(path) if urlparse(path).scheme else LocalFS()


def read_json(fs, path: str) -> dict | None:
    if not fs.exists(path):
        return None
    return json.loads(fs.read_text(path))


def write_json_atomic(fs, path: str, obj: dict) -> None:
    fs.write_text_atomic(path, json.dumps(obj, indent=1, sort_keys=True))
