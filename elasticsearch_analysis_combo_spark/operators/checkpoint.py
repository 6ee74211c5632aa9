"""Checkpoint / lineage / metrics (SURVEY.md §2 B6, north_rule "resumable
from checkpoint with per-partition lineage + metrics").

Every pipeline stage writes its output as a parquet table plus a manifest
JSON keyed by (stage name, input fingerprint). Re-running the pipeline skips
stages whose manifest matches — the Iceberg-snapshot pattern, implemented on
plain parquet for the sandbox (atomicity via write-to-temp + rename).

Lineage recorded per stage: input fingerprint, row count, per-partition row
counts (partition id -> rows), wall time, and a content checksum
(xor of xxhash64 over a stage-chosen key column set) so a resumed run can be
byte-verified against a fresh one.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint(*parts) -> str:
    """Stable fingerprint over stage params (config dicts, paths, numbers)."""
    import hashlib

    blob = json.dumps(parts, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)
        self.metrics_path = os.path.join(base_dir, "metrics.jsonl")

    def _paths(self, stage: str):
        return (
            os.path.join(self.base_dir, stage),
            os.path.join(self.base_dir, f"{stage}.manifest.json"),
        )

    def has(self, stage: str, fp: str) -> bool:
        _, manifest = self._paths(stage)
        if not os.path.exists(manifest):
            return False
        try:
            with open(manifest) as f:
                return json.load(f)["fingerprint"] == fp
        except Exception:
            return False

    def load(self, stage: str) -> DataFrame:
        data, _ = self._paths(stage)
        return self.spark.read.parquet(data)

    def manifest(self, stage: str) -> dict:
        _, manifest = self._paths(stage)
        with open(manifest) as f:
            return json.load(f)

    def run(
        self,
        stage: str,
        fp: str,
        builder,
        checksum_cols: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage. ``builder()`` returns the stage's
        DataFrame; output is persisted with lineage before being returned."""
        if self.has(stage, fp):
            self._log({"stage": stage, "event": "resume_hit", "fingerprint": fp,
                       "ts": time.time()})
            return self.load(stage)
        data_dir, manifest_path = self._paths(stage)
        tmp_dir = data_dir + f".tmp-{uuid.uuid4().hex[:8]}"
        t0 = time.time()
        df = builder()
        df.write.mode("overwrite").parquet(tmp_dir)
        wall = time.time() - t0
        out = self.spark.read.parquet(tmp_dir)
        # per-partition lineage over the *persisted* files
        part_rows = (
            out.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        n_rows = sum(r["count"] for r in part_rows)
        checksum = None
        if checksum_cols:
            cols = ", ".join(f"`{c}`" for c in checksum_cols)
            checksum = (
                out.agg(
                    F.expr(f"bit_xor(xxhash64({cols}))").alias("c")
                ).collect()[0]["c"]
            )
            checksum = int(checksum) if checksum is not None else 0
        # atomic swap
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir)
        os.rename(tmp_dir, data_dir)
        man = {
            "stage": stage,
            "fingerprint": fp,
            "rows": n_rows,
            "partitions": {str(r["pid"]): r["count"] for r in part_rows},
            "checksum": checksum,
            "wall_sec": wall,
            "created_at": time.time(),
        }
        with open(manifest_path, "w") as f:
            json.dump(man, f, indent=1)
        self._log({**man, "event": "built"})
        return self.load(stage)

    def _log(self, rec: dict) -> None:
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
