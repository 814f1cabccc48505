"""Resumable checkpoint store with per-stage lineage + metrics.

Each pipeline stage writes a parquet table under
``{root}/{stage}/config={config_hash}/`` together with a ``_MANIFEST.json``
recording stage name, config hash, row count, wall time and an input
fingerprint. On re-run, a stage whose manifest exists (and whose input
fingerprint matches) is loaded instead of recomputed — the batch analog of
exactly-once state (SURVEY.md §2.9).

On a real cluster these tables are Iceberg (``writeTo(...).createOrReplace``;
snapshot id = the lineage pointer) — parquet-dir + manifest is the
local-catalog fallback since this sandbox ships no Iceberg runtime jar. The
store keys every path by config_hash, so changing any semantic knob of
``PipelineConfig`` invalidates all downstream state automatically.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, config_hash: str):
        self.spark = spark
        self.root = root
        self.config_hash = config_hash
        self.metrics: list[dict] = []

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage, f"config={self.config_hash}")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_MANIFEST.json")

    def exists(self, stage: str, input_fingerprint: str | None = None) -> bool:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        if input_fingerprint is None:
            return True
        with open(p) as f:
            return json.load(f).get("input_fingerprint") == input_fingerprint

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(stage))

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        input_fingerprint: str | None = None,
    ) -> DataFrame:
        """Load `name` if checkpointed, else compute, persist, and read back.

        Reading back after write means downstream stages consume a clean
        parquet scan (column-pruned, no recompute of the UDF lineage).
        """
        if self.exists(name, input_fingerprint):
            df = self.load(name)
            self.metrics.append(
                dict(stage=name, config_hash=self.config_hash, resumed=True,
                     rows=None, wall_ms=0)
            )
            return df
        t0 = time.time()
        df = fn()
        out_dir = self._dir(name)
        df.write.mode("overwrite").parquet(out_dir)
        out = self.spark.read.parquet(out_dir)
        rows = out.count()
        wall_ms = int((time.time() - t0) * 1000)
        manifest = dict(
            stage=name,
            config_hash=self.config_hash,
            rows=rows,
            wall_ms=wall_ms,
            input_fingerprint=input_fingerprint,
            written_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            partitions=out.rdd.getNumPartitions(),
        )
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f)
        self.metrics.append(
            dict(stage=name, config_hash=self.config_hash, resumed=False,
                 rows=rows, wall_ms=wall_ms)
        )
        return out


    def write_metrics(self) -> str | None:
        """Persist the accumulated per-stage metrics ledger (FIXTURES.md §4)
        as JSON next to the checkpoint tables. Returns the path."""
        if not self.root:
            return None
        os.makedirs(self.root, exist_ok=True)
        path = os.path.join(self.root, f"metrics_{self.config_hash}.json")
        with open(path, "w") as f:
            json.dump(self.metrics, f, indent=1)
        return path


class NullStore(CheckpointStore):
    """No-persistence store (tests / bench): every stage recomputes."""

    def __init__(self, spark: SparkSession, config_hash: str):
        super().__init__(spark, root="", config_hash=config_hash)

    def stage(self, name, fn, input_fingerprint=None):
        t0 = time.time()
        df = fn()
        self.metrics.append(
            dict(stage=name, config_hash=self.config_hash, resumed=False,
                 rows=None, wall_ms=int((time.time() - t0) * 1000))
        )
        return df
