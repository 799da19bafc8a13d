"""Iceberg-style warehouse: partitioned parquet stage dirs + JSON manifests.

No pyiceberg in this sandbox (SURVEY.md §7 hard part (e)); we implement the
properties the north rule needs from Iceberg — atomic per-stage commits,
config-hash-validated snapshots, resumability — as parquet directories plus a
tiny manifest file. On a production cluster the writer swaps to a real Iceberg
catalog (`df.writeTo(table)`) with no pipeline-code changes: `Warehouse` is
the only module that touches paths.

Resume contract (BASELINE.json "resumes mid-band"): a stage whose manifest
exists AND records the current config_hash is read back instead of recomputed;
a killed job therefore restarts at its first incomplete stage. Manifests are
written atomically (tmp + rename) AFTER the parquet commit, so a crash between
the two re-runs the stage idempotently (mode=overwrite)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, root: str, config_hash: str, run_id: str = "run0"):
        self.root = root
        self.config_hash = config_hash
        self.run_id = run_id
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"_manifest_{stage}.json")

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        return bool(m) and m.get("config_hash") == self.config_hash

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self._dir(stage))

    def write(
        self,
        df: DataFrame,
        stage: str,
        wall_ms: int = 0,
        band_lo: int | None = None,
        band_hi: int | None = None,
        extra: dict | None = None,
    ) -> dict:
        """Overwrite stage dir, then atomically commit the manifest."""
        path = self._dir(stage)
        t0 = time.time()
        df.write.mode("overwrite").parquet(path)
        exec_ms = int((time.time() - t0) * 1000)
        # row/partition counts from the written files (no plan recompute —
        # avoids the reference's repeated-count() inefficiency, SURVEY.md §3.1)
        import pyarrow.parquet as pq

        parts = [f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")]
        # row counts straight from parquet footers (driver-side, no Spark job)
        n_rows = sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows for f in parts
        )
        man = {
            "run_id": self.run_id,
            "stage": stage,
            "band_lo": band_lo,
            "band_hi": band_hi,
            "partition_count": len(parts),
            "row_count": n_rows,
            "config_hash": self.config_hash,
            "wall_ms": wall_ms + exec_ms,  # build (incl. eager actions) + execution
            "exec_ms": exec_ms,
            "committed_at": int(time.time() * 1000),
            **(extra or {}),
        }
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(stage))
        self._append_lineage(man)
        return man

    def _append_lineage(self, man: dict) -> None:
        with open(os.path.join(self.root, "_lineage.jsonl"), "a") as f:
            f.write(json.dumps({k: man[k] for k in (
                "run_id", "stage", "band_lo", "band_hi", "partition_count",
                "row_count", "config_hash", "wall_ms")}, sort_keys=True) + "\n")

    def lineage(self) -> list[dict]:
        p = os.path.join(self.root, "_lineage.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def invalidate_after(self, stage: str, ordered_stages: list[str]) -> None:
        """Drop manifests for `stage` and everything after it (kill/resume tests)."""
        if stage in ordered_stages:
            for s in ordered_stages[ordered_stages.index(stage):]:
                p = self._manifest_path(s)
                if os.path.exists(p):
                    os.remove(p)
