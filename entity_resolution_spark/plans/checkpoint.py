"""Per-stage checkpointing with lineage + resumability.

Generalizes the reference's feature-cache pattern — write processed records, on
re-run fetch what exists and process only the difference
(``am_combiner/utils/build_feature_cache.py:77-86``) — to every pipeline stage.

Backend: Parquet directories laid out like Iceberg tables (one dir per stage, a
``_lineage`` JSON sidecar carrying run_id, stage name, row count, input signature).
On a cluster with an Iceberg catalog, ``CheckpointStore`` swaps ``df.write.parquet``
for ``df.writeTo(catalog.table).createOrReplace()`` — the interface is format-
agnostic and nothing else changes (the Iceberg runtime jar is not in this sandbox,
so the parquet path is what tests exercise).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class StageLineage:
    run_id: str
    stage: str
    rows: int
    input_signature: str
    wall_sec: float
    written_at: float


class CheckpointStore:
    """Directory of per-stage checkpoints; a stage is reused iff its input signature
    matches (resume-from-checkpoint mid-pipeline)."""

    def __init__(self, spark: SparkSession, root: str, run_id: str = "run0"):
        self.spark = spark
        self.root = root
        self.run_id = run_id
        os.makedirs(root, exist_ok=True)
        self.stage_seconds: dict[str, float] = {}

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._lineage.json")

    def has(self, stage: str, input_signature: str = "") -> bool:
        lp = self._lineage_path(stage)
        if not os.path.exists(lp):
            return False
        with open(lp) as f:
            lin = json.load(f)
        return lin.get("input_signature") == input_signature

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(stage))

    def write(self, stage: str, df: DataFrame, input_signature: str = "") -> DataFrame:
        """Materialize a stage; returns the re-read (checkpointed) frame so downstream
        lineage is cut at the stage boundary (the cluster analog of the reference's
        cache collection)."""
        t0 = time.monotonic()
        # invalidate BEFORE overwriting: the overwrite deletes the old stage
        # dir first, so a crash mid-write would otherwise leave the stale
        # lineage sidecar pointing `has()` at a corrupt/partial directory —
        # the resume would silently read it. With the sidecar gone first, any
        # interrupted write simply recomputes the stage on the next run.
        lp = self._lineage_path(stage)
        if os.path.exists(lp):
            os.remove(lp)
        df.write.mode("overwrite").parquet(self._dir(stage))
        wall = time.monotonic() - t0
        out = self.read(stage)
        rows = out.count()
        lin = StageLineage(
            run_id=self.run_id,
            stage=stage,
            rows=rows,
            input_signature=input_signature,
            wall_sec=wall,
            written_at=time.time(),
        )
        with open(self._lineage_path(stage), "w") as f:
            json.dump(lin.__dict__, f)
        self.stage_seconds[stage] = wall
        return out

    def get_or_compute(self, stage: str, compute, input_signature: str = "") -> DataFrame:
        if self.has(stage, input_signature):
            return self.read(stage)
        return self.write(stage, compute(), input_signature)
